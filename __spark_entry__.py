"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke).
``queries()`` — every implemented operator from SURVEY.md §2 (and the
north-star pipeline ops), as (spark, sf_dir) → DataFrame callables.
``oracle_sql()`` — DuckDB twins for the correctness gate.

Implementation lives in the ``binaryx_graph_spark`` package; this module
is a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binaryx_graph_spark.registry import load_all  # noqa: E402
from binaryx_graph_spark.session import tune_for_session  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_for_session(spark)
    reg = load_all()
    return reg["q1_pricing_summary"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = load_all()

    def wrap(q):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_session(spark)
            return q.fn(spark, sf_dir)

        run.__name__ = q.name
        run.__doc__ = q.doc
        return run

    return {name: wrap(q) for name, q in reg.items()}


def oracle_sql() -> dict[str, str]:
    reg = load_all()
    return {name: q.oracle for name, q in reg.items() if q.oracle is not None}
