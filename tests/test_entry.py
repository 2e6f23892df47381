"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_SMOKE = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    for name in oracles:
        assert name in qs, f"oracle {name} has no query"


def test_every_query_runs_at_smoke_sf(spark):
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name


def test_witness_rotation_is_self_maintaining():
    """Registry iteration order puts queries WITHOUT a fully-green
    driver CORRECTNESS row first (the driver samples the head-50), and
    every registered name appears exactly once — so witnessing rotates
    automatically as new round artifacts land in the repo."""
    from binaryx_graph_spark.registry import _witnessed_green, load_all

    green = _witnessed_green()
    names = list(load_all())
    assert len(names) == len(set(names))
    n_fresh = sum(1 for n in names if n not in green)
    # every unwitnessed name must come before every witnessed one
    assert all(n not in green for n in names[:n_fresh])
    assert all(n in green for n in names[n_fresh:])
