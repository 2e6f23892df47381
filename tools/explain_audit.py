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

AUDITED = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "window_topk_per_group",
    "distinct_users_per_type",
    "fulltext_search_default",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_metrics",
    "scope_semi_join",
    "unresolved_anti_join",
    "event_sessionization",
    "asof_join_last_purchase",
    "rollup_daily_events",
    "pivot_event_counts",
    "q17_small_quantity_revenue",
    "pipeline_curation_stats",
    # r2 additions
    "q4_priority_exists",
    "q14_promo_revenue_share",
    "q16_supplier_distinct_parts",
    "q21_sole_late_supplier",
    "dedup_jaccard_prefix_filtered",
    "dedup_simhash_hamming",
    "dedup_embedding_cosine",
    "ann_cosine_ivf",
    "ann_cosine_lsh_multiprobe",
    "events_json_extract",
    "skew_salted_counts",
    "sketch_cms_user_counts",
    "text_gopher_rules",
    # full TPC-H family (queries/tpch_ext.py)
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_late_priority_counts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q19_disjunctive_revenue",
    "q20_part_promotion_suppliers",
    "q22_global_sales_opportunity",
    # graph analytics + pipeline utilities (queries/analytics_ext.py)
    "graph_pagerank",
    "graph_triangle_counts",
    "pipeline_stratified_split",
    "text_tfidf_topk",
    "docs_deterministic_sample",
    # continuation additions
    "graph_personalized_pagerank",
    "ann_cosine_pq",
    "sketch_hll_distinct",
    "sketch_histogram_quantiles",
    "events_funnel_conversion",
    "events_scd2_intervals",
    "orders_daily_moving_avg",
    "grouped_map_user_stats",
    "python_udtf_ngrams",
    "python_datasource_functions",
    # this-session additions (r2, cont.)
    "dedup_semantic_kmeans",
    "dedup_exact_substring",
    "bloom_prefilter_semi_join",
    "graph_connected_components",
    "text_unigram_surprisal",
    "layout_zorder_stats",
    "cube_event_stats",
    "grouping_sets_explicit",
    "window_decile_stats",
    "range_join_daily_windows",
    "graph_shortest_paths",
    "arrow_python_udf_langlen",
    "unpivot_event_counts",
    "lateral_topk_per_user",
]


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
    wanted = [a for a in sys.argv[1:] if not os.path.isdir(a)] or AUDITED

    reg = load_all()
    spark = get_spark("plan-audit")
    # un-truncated plan strings: a truncated ReadSchema loses its closing
    # '>' and makes the wide-scan regex span several scans (false 27-col
    # "wide scan" on perfectly pruned plans)
    spark.conf.set("spark.sql.debug.maxToStringFields", "2000")
    sections = []
    any_flags = False
    for name in wanted:
        q = reg[name]
        df = q.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        flags = audit_plan(name, plan)
        any_flags |= bool(flags)
        status = "⚠ " + "; ".join(flags) if flags else "clean"
        print(f"{name}: {status}")
        sections.append(f"## {name}\n\nstatus: {status}\n\n```\n{plan[:4000]}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("# Physical-plan audit (generated by tools/explain_audit.py)\n\n" + "\n".join(sections))
    spark.stop()
    return 1 if any_flags else 0


if __name__ == "__main__":
    sys.exit(main())
