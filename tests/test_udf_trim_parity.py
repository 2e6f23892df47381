"""Python-UDF trim semantics must match SQL trim() on BOTH engines.

Regression for the divergence where the Arrow row-UDF used Python's bare
``str.strip()`` (removes \n/\t/…) while the DuckDB oracle's ``trim()``
(and Spark's) removes only spaces — invisible on testdata with no
trailing non-space whitespace, wrong on any document ending in a
newline. The fixture here pins exactly those rows.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.registry import load_all


def test_langlen_udf_matches_oracle_on_whitespace_tails(spark, tmp_path):
    rows = [
        # doc_id % 6 == 1 so the query's filter keeps them
        (1, "  plain spaces  ", "en", "t", 16),
        (7, "ends in newline\n", "en", "t", 16),
        (13, "\ttab framed\t", "en", "t", 12),
        (19, "mixed   \n\t ", "en", "t", 11),
        (25, None, "en", "t", 0),
        (31, " \n", "en", "t", 2),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    q = load_all()["arrow_python_udf_langlen"]
    got = [
        (r["doc_id"], r["trimmed_len"], r["length_class"])
        for r in q.fn(spark, sf_dir).collect()
    ]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    want = [tuple(r) for r in con.execute(q.oracle).fetchall()]
    assert got == want, (got, want)
    # the newline row must keep its trailing \n under SQL-trim semantics
    by_id = dict((d, n) for d, n, _ in got)
    assert by_id[7] == len("ends in newline\n")
