"""Round-10 ADVICE regression suite — five reviewer findings, each
pinned by the failure it named:

1. Zone maps over float/double columns are NaN-blind (parquet stats
   exclude NaN; Spark orders NaN above everything) — float stats must
   be DROPPED so scan never prunes a file whose only matches are NaN.
2. Bucketed point-lookup must hash the probe literal AS THE STORED
   TYPE — xxhash64(int32 5) != xxhash64(int64 5), so an un-cast literal
   silently probes the wrong bucket on a numeric-keyed table.
3. update_where must RAISE on a type-changing assignment instead of
   silently casting (ANSI off: failed cast writes NULLs into rows).
4. The CDF partition diff must keep int64-with-nulls columns integral
   (pyarrow→pandas default decays them to float64, losing >2^53 ids).
5. CLI scan literals are typed from the table schema — `uid,=,777`
   against a string key stays the string '777'.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from binaryx_graph_spark.cli import _parse_preds, _typed_literal
from binaryx_graph_spark.sources import warehouse as wh_mod
from binaryx_graph_spark.sources.warehouse import Warehouse, _parquet_minmax


def _fns(spark, n=200):
    return spark.range(n).select(
        F.col("id").cast("string").alias("uid"),
        F.concat(F.lit("fn_"), F.col("id")).alias("name"),
        F.lit("").alias("address"),
        F.col("id").cast("long").alias("size"),
        F.lit("Internal").alias("type"),
    )


# ----------------------------------------------------- 1. NaN zone maps
def test_parquet_minmax_drops_float_columns(spark, tmp_path):
    p = str(tmp_path / "f.parquet")
    spark.range(10).select(
        F.col("id"), (F.col("id") * 1.5).alias("val")
    ).coalesce(1).write.parquet(p)
    import pathlib

    part = next(pathlib.Path(p).glob("*.parquet"))
    stats = _parquet_minmax(part)
    assert "id" in stats  # int column still prunable
    assert "val" not in stats  # float column: NaN-blind stats dropped


def test_scan_returns_nan_rows_from_float_predicates(spark, tmp_path):
    # two externally-written flat files: one whose ONLY >0-matching rows
    # are NaN (stats would say max=-1.0 and prune it), one normal
    root = tmp_path / "wh"
    tdir = root / "metrics"
    tdir.mkdir(parents=True)
    nan = float("nan")
    spark.createDataFrame(
        [(1, nan), (2, -1.0)], "id long, val double"
    ).coalesce(1).write.parquet(str(tmp_path / "a"))
    spark.createDataFrame(
        [(3, 5.0), (4, -2.0)], "id long, val double"
    ).coalesce(1).write.parquet(str(tmp_path / "b"))
    import pathlib
    import shutil

    for i, src in enumerate((tmp_path / "a", tmp_path / "b")):
        f = next(pathlib.Path(src).glob("*.parquet"))
        shutil.copy(f, tdir / f"part-{i:05d}.parquet")
    wh = Warehouse(spark, str(root))
    got, diag = wh.scan("metrics", [("val", ">", 0.0)], with_diagnostics=True)
    rows = {(r["id"], "nan" if math.isnan(r["val"]) else r["val"]) for r in got.collect()}
    # Spark: NaN > 0.0 is TRUE — the NaN row MUST come back
    assert rows == {(1, "nan"), (3, 5.0)}
    # float preds prune nothing, by design (None = unadopted flat dir
    # read straight through, which is equally unpruned)
    assert diag["files_read"] in (None, 2)


# ------------------------------------- 2. numeric-key point lookup cast
def test_point_lookup_numeric_key_hashes_stored_type(spark, tmp_path, monkeypatch):
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("payload", StringType()),
        ]
    )
    monkeypatch.setitem(wh_mod.MERGE_KEYS, "metrics_k", ["id"])
    monkeypatch.setitem(wh_mod.ALL_TABLES, "metrics_k", (schema, ["id"]))
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(500).select(
        F.col("id").cast("long").alias("id"),
        F.concat(F.lit("p_"), F.col("id")).alias("payload"),
    )
    wh.merge_batch({"metrics_k": df})
    # the Python literal 5 may resolve as a 32-bit int via py4j — the
    # probe must cast it to the stored LongType before hashing, or it
    # lands in the wrong bucket and the lookup silently returns 0 rows
    got, diag = wh.scan("metrics_k", [("id", "=", 5)], with_diagnostics=True)
    rows = got.collect()
    assert [(r["id"], r["payload"]) for r in rows] == [(5, "p_5")]
    assert diag["files_read"] <= max(
        1, diag["files_total"] // 2
    ), "point lookup should prune to the key's bucket"
    # float literal against an integral key: guard must REJECT the fast
    # path (Spark's implicit cast matches 5.0 == 5L; hashing 5.0 would
    # probe a wrong bucket) — correctness over pruning
    got2 = wh.scan("metrics_k", [("id", "=", 5.0)])
    assert [(r["id"], r["payload"]) for r in got2.collect()] == [(5, "p_5")]


# ----------------------------------------- 3. update_where type changes
def test_update_where_rejects_type_changing_assignment(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.clear()
    wh.merge_batch({"functions": _fns(spark)})
    with pytest.raises(ValueError, match="changes column types"):
        wh.update_where("functions", [("uid", "=", "5")], {"size": "abc"})
    # unchanged: the bad update must not have committed anything
    assert wh.read("functions").filter(F.col("size").isNull()).count() == 0
    # lossless widen still allowed: int literal into long column
    d = wh.update_where("functions", [("uid", "=", "5")], {"size": 7})
    assert d["rows_updated"] == 1
    assert (
        wh.read("functions").filter(F.col("uid") == "5").head()["size"] == 7
    )
    # Column expression of the right type still allowed
    d = wh.update_where(
        "functions", [("uid", "=", "6")], {"name": F.upper(F.col("name"))}
    )
    assert d["rows_updated"] == 1
    assert (
        wh.read("functions").filter(F.col("uid") == "6").head()["name"]
        == "FN_6"
    )


# ------------------------------------------- 4. CDF int64-null fidelity
def test_cdf_diff_preserves_big_ints_with_nulls(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from binaryx_graph_spark.sources.cdf_stream import (
        _CdfPartition,
        WarehouseCdfStreamReader,
    )

    root = tmp_path / "wh"
    big = 2**53 + 1  # adjacent to 2^53: float64 cannot represent big+1
    big2 = 2**53 + 2
    old = pa.table({"id": pa.array([big, None], type=pa.int64())})
    new = pa.table({"id": pa.array([big2, None], type=pa.int64())})
    d = root / "t" / "_kb=0"
    d.mkdir(parents=True)
    pq.write_table(old, d / "old.parquet")
    pq.write_table(new, d / "new.parquet")
    rdr = WarehouseCdfStreamReader(str(root), "t", ["id"])
    part = _CdfPartition(
        str(root / "t"),
        "t",
        "0",
        ["_kb=0/old.parquet"],
        ["_kb=0/new.parquet"],
        7,
        ["id"],
    )
    rows = sorted(rdr.read(part), key=lambda r: (str(r[0]), r[1]))
    # float64 decay would collapse big and big2 into the SAME value and
    # emit floats; the diff must see exact Python ints
    assert rows == [(big, "delete", 7), (big2, "insert", 7)]
    assert all(isinstance(r[0], int) for r in rows)


# ------------------------------------------------ 5. CLI literal typing
def test_cli_literal_typed_from_schema():
    schema = StructType(
        [
            StructField("uid", StringType()),
            StructField("size", LongType()),
            StructField("score", DoubleType()),
        ]
    )
    preds = _parse_preds(
        ["uid,=,777", "size,>,10", "score,<=,0.5"], schema
    )
    assert preds == [
        ("uid", "=", "777"),  # string key: numeric-looking stays string
        ("size", ">", 10),
        ("score", "<=", 0.5),
    ]
    # quoted form forces a string even against a numeric column
    assert _typed_literal("'0777'", LongType()) == "0777"
    # unparseable numeric raises instead of silently degrading
    with pytest.raises(SystemExit):
        _typed_literal("abc", LongType())
    # unknown schema falls back to the old heuristic
    assert _parse_preds(["x,=,5"], None) == [("x", "=", 5)]
