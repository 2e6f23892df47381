"""r12 optimization invariants, pinned at the PLAN level.

These lock the shuffle-count wins of the r12 round so a later refactor
cannot silently reintroduce the exchanges:

- bm25_topk: scoring is one tokenize projection + in-row fold —
  ZERO Exchange nodes in the executed plan (the old shape paid two
  corpus shuffles and tokenized three times).
- classifier design matrix: the build is a pure projection — zero
  Exchange; each training epoch's gradient is the ONLY shuffle.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.model import load_table
from binaryx_graph_spark.operators.textstats import _design_matrix, bm25_topk

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_plan_is_exchange_free(spark):
    docs = load_table(spark, SF_DIR, "documents")
    top = bm25_topk(docs, ["spark", "join", "window"], k=25)
    top.collect()  # resolve AQE to the final plan
    plan = _executed_plan(top)
    assert "Exchange" not in plan, plan
    # the sort-limit must be the TakeOrdered form, not a global sort
    assert "TakeOrderedAndProject" in plan, plan


def test_design_matrix_is_per_doc_projection(spark):
    docs = load_table(spark, SF_DIR, "documents")
    dm = _design_matrix(docs, "doc_id", "text", "lang", "en")
    # one row per doc, raw bucket sequence in hand (no (doc,bucket,cnt)
    # explode shape), zero-token docs excluded
    assert dm.columns == ["doc_id", "y", "bks"]
    n_docs = docs.count()
    n_dm = dm.count()
    assert 0 < n_dm <= n_docs
    row = dm.limit(1).collect()[0]
    assert len(row["bks"]) > 0
    assert all(0 <= b < 256 for b in row["bks"])
