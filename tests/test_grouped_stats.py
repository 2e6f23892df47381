"""The grouped-map applyInPandas kernel and its pure-Column twin must be
value-identical — same cents convention, same operation order."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.model import load_table
from binaryx_graph_spark.operators.grouped_stats import (
    user_value_stats,
    user_value_stats_column,
)

SF = "/root/testdata/sf0.001"


def test_grouped_map_equals_column_twin(spark):
    ev = load_table(spark, SF, "events")
    a = {r.user_id: r for r in user_value_stats(ev).collect()}
    b = {r.user_id: r for r in user_value_stats_column(ev).collect()}
    assert set(a) == set(b)
    for uid in a:
        assert a[uid].n_events == b[uid].n_events, uid
        # bit-identical, not approximately equal — both paths run the
        # same exact-int internals and the same IEEE tail ops
        assert a[uid].mean_value == b[uid].mean_value, uid
        assert a[uid].std_value == b[uid].std_value, uid


def test_single_event_user_has_zero_std(spark):
    ev = load_table(spark, SF, "events").limit(1)
    row = user_value_stats(ev).collect()[0]
    assert row.n_events == 1
    assert row.std_value == 0.0
