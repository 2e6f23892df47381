"""Plan auditor: dump the physical plan of every registered query and
flag scale anti-patterns:

- CartesianProduct / BroadcastNestedLoopJoin on non-tiny inputs
- parquet scans with no pushed filters AND no column pruning
- single-partition global Window (the reference of a driver bottleneck)
- RowToColumnar / ColumnarToRow churn beyond the scan boundary

Usage: python tools/explain_audit.py [sf_dir] [query ...]
Writes PLANS.md with one section per audited query.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.registry import load_all  # noqa: E402
from binaryx_graph_spark.session import get_spark  # noqa: E402

# Default = EVERY registered query (the audit is only a proof if it
# covers the whole catalog); pass names on the CLI to audit a subset.


def audit_plan(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        # a broadcasted single-row query vector is fine; anything else isn't
        if "broadcast" not in plan.lower():
            flags.append("CartesianProduct without broadcast")
    # the ANN family legitimately broadcasts a SINGLE-ROW query vector
    # (and IVF its k-row probe list) — a 1-row build side NLJ is the
    # right plan there, not a leaked cartesian
    if re.search(r"BroadcastNestedLoopJoin", plan) and name not in (
        "ann_cosine_topk",
        "ann_cosine_lsh",
        "ann_cosine_ivf",
        # TPC-H scalar-subquery shapes: the build side is a broadcast
        # 1-ROW aggregate (global total / max / average) compared with a
        # non-equi predicate — the correct plan for value-vs-global
        # filters, not a leaked cartesian
        "q11_important_stock",
        "q15_top_supplier",
        "q22_global_sales_opportunity",
        # 1-row broadcast compositions: PQ broadcasts the single query
        # vector (like the ann family); the sketch/funnel queries
        # cross-join 1-row aggregates (estimate × exact count, staged
        # funnel counts, quantile picks) — constant-size build sides
        "ann_cosine_pq",
        "ann_cosine_pq_rerank",
        # batch kNN: the QUERY BATCH is the broadcast build side (the
        # corpus is the streamed side) — the intended exact-variant plan;
        # the scale path swaps in IVF/LSH-pruned candidates upstream
        "ann_knn_join_batch",
        # recall@k measurement: contains the exact kNN baseline by
        # definition (recall needs the ground truth), so the same
        # broadcast-query-batch cross as ann_knn_join_batch is intended
        "ann_recall_lsh_multiprobe",
        # IVF batch kNN: probe selection crosses the broadcast query
        # batch with the n_centroids-row codebook — both dimension-sized
        "ann_knn_join_batch_ivf",
        # vocab coverage: the 1-ROW global token-count total broadcasts
        # onto the cutoff rows (coverage = cum/total) — constant-size
        # build side like the sketch queries
        "text_vocab_coverage",
        "sketch_hll_distinct",
        "sketch_histogram_quantiles",
        "events_funnel_conversion",
        # unigram LM: the 1-ROW total-token-count aggregate broadcasts
        # onto the vocab frame (p = c/N needs the global N) — same
        # constant-size build side as the sketch queries
        "text_unigram_surprisal",
        # interval range join: the window dimension (≤ days-in-corpus
        # rows) broadcasts and the non-equi predicate evaluates at the
        # probe scan — a broadcast NLJ IS the right plan for a range
        # join against a dimension-sized interval table
        "range_join_daily_windows",
        # domain mixture: the 1-ROW Σweight total broadcasts onto the
        # source-count dimension (allocation = share of the global
        # weight sum) — same constant-size build side as the sketches
        "pipeline_domain_mixture",
        # PMI: the 1-ROW corpus doc count broadcasts onto the pair
        # frame (ratio needs the global N) — constant-size build side
        "text_pmi_cooccurrence",
    ):
        flags.append("BroadcastNestedLoopJoin (non-equi join leaked in)")
    # wide-scan check: count FIELDS in each ReadSchema struct (a field is
    # `name:type`), flag only genuinely wide unpruned scans.  Bounded to
    # one LINE: simple-mode plan strings hard-truncate long lines, which
    # can cut the closing '>' and would otherwise let the match run into
    # the next scan (false 27-column flags on pruned plans).
    for m in re.finditer(r"ReadSchema: struct<([^>\n]*)", plan):
        body = m.group(1)
        n_fields = body.count(":")
        if n_fields > 12:
            flags.append(f"wide scan ({n_fields} columns — check column pruning)")
    if "Window" in plan and "partitionBy" not in plan:
        w = re.search(r"Window \[[^\]]*\](?!.*partition)", plan)
        if w and "windowspecdefinition()" in plan.replace(" ", ""):
            flags.append("global (unpartitioned) Window")
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    reg = load_all()
    subset = [a for a in sys.argv[1:] if not os.path.isdir(a)]
    wanted = subset or sorted(reg)
    spark = get_spark("plan-audit")
    # un-truncated plan strings: a truncated ReadSchema loses its closing
    # '>' and makes the wide-scan regex span several scans (false 27-col
    # "wide scan" on perfectly pruned plans)
    spark.conf.set("spark.sql.debug.maxToStringFields", "2000")
    sections: dict[str, str] = {}
    plans_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    if subset and os.path.exists(plans_path):
        # subset run: merge into the existing audit instead of clobbering
        # the other queries' sections
        with open(plans_path, encoding="utf-8", errors="replace") as f:
            body = f.read()
        for chunk in body.split("\n## ")[1:]:
            n = chunk.split("\n", 1)[0].strip()
            if n in reg:  # drop sections for deleted/renamed queries
                sections[n] = "## " + chunk.rstrip("\n") + "\n"
    any_flags = False
    for name in wanted:
        q = reg[name]
        df = q.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        flags = audit_plan(name, plan)
        any_flags |= bool(flags)
        status = "⚠ " + "; ".join(flags) if flags else "clean"
        print(f"{name}: {status}")
        sections[name] = f"## {name}\n\nstatus: {status}\n\n```\n{plan[:4000]}\n```\n"
    with open(plans_path, "w") as f:
        f.write(
            "# Physical-plan audit (generated by tools/explain_audit.py)\n\n"
            + "\n".join(sections[n] for n in sorted(sections))
        )
    spark.stop()
    return 1 if any_flags else 0


if __name__ == "__main__":
    sys.exit(main())
