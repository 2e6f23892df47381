"""End-to-end training-data curation pipeline: the north-star operators
composed the way a real 100 TB corpus pass would run them.

    raw documents
      → quality gate        (token/diversity thresholds, one scan)
      → exact dedup         (content-key hash, keep min doc per group)
      → near-dup dedup      (shingle Jaccard ≥ t → connected components,
                             keep each cluster's canonical = min id)
      → curated set + per-stage retention stats

Each stage is an existing verified operator; the composition itself is
oracle-checked end-to-end (queries/pipeline_demo.py) — stage counts must
match a DuckDB reimplementation of the whole flow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import load_table
from .operators.dedup import connected_components, jaccard_pairs_prefix
from .operators.textstats import spark_sql_tokens

#: curation thresholds (documented knobs). JACCARD_T = 0.8 is the
#: standard near-dup bar in corpus-dedup practice (0.7-0.9); it also
#: makes the PPJoin prefix filter effective — prefix length is
#: ⌊(1-t)·|doc|⌋+1, so t=0.8 prunes the candidate join to the rarest
#: ~20% of each doc's shingles (t=0.5 would keep half: measured 288k
#: candidates for 157 final pairs at sf0.1).
MIN_TOKENS = 40
MIN_TTR = 0.10
JACCARD_T = 0.8


def curate_documents(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Run the full curation flow; returns {'curated': df, 'stats': df}.

    ``stats`` is one row: (n_input, n_quality, n_exact, n_curated).
    """
    docs = load_table(spark, sf_dir, "documents")

    # ONE heavy pass over the text: quality metrics + exact-dedup key in
    # a single projection, checkpointed — every later stage (counts,
    # dedup join, shingles) reads the materialized rows instead of
    # re-running the tokenize/hash expressions (HOF exprs get no CSE;
    # the separate per-stage count jobs were the pipeline's cost center,
    # not the joins — measured at sf0.1).  r13: the expressions are
    # composed SQL strings parsed once (guide §1/§4 driver boundary,
    # same trees as the former quality_metrics Columns — n_tokens =
    # CAST(size(tokens) AS long), ttr = n_unique/n_tokens as double).
    toks = spark_sql_tokens("text")
    keyed = (
        docs.selectExpr(
            "doc_id",
            "text",
            f"CAST(size({toks}) AS long) AS n_tokens",
            f"CAST(CAST(size(array_distinct({toks})) AS long)"
            f" / CAST(size({toks}) AS long) AS double) AS ttr",
        )
        .where(f"n_tokens >= {MIN_TOKENS} AND ttr >= {MIN_TTR!r}D")
        .selectExpr("doc_id", "text", f"sha2(concat_ws(' ', {toks}), 256) AS _k")
        .localCheckpoint(eager=True)
    )
    quality = keyed.select("doc_id", "text")

    # exact dedup on the full normalized text (prefix-key variants exist
    # as dedup_exact; full-text here so the NEAR-dup stage downstream
    # handles the paraphrase-level duplicates)
    canonical = keyed.groupBy("_k").agg(F.min("doc_id").alias("doc_id"))
    exact = keyed.join(canonical, ["_k", "doc_id"], "left_semi").select("doc_id", "text")
    exact = exact.localCheckpoint(eager=True)

    # PPJoin-style prefix-filtered exact Jaccard: provably the same pair
    # set as the naive all-pairs shingle self-join above the threshold
    # (gate-verified equal in dedup_jaccard_prefix_filtered), but the
    # candidate join touches only each doc's rarest-shingle prefix — the
    # scale path for the real 100 TB corpus pass (VERDICT r1 #3).
    pairs = jaccard_pairs_prefix(exact, "doc_id", "text", n=3, threshold=JACCARD_T)
    clusters = connected_components(pairs)
    dropped = clusters.filter(F.col("cluster_id") != F.col("doc_id")).select("doc_id")
    curated = exact.join(dropped, "doc_id", "left_anti")

    # tall (stage, n) layout: plain union of single-row aggregates —
    # no 1×1 cross joins (which plan as BroadcastNestedLoopJoin and
    # trip the plan audit even though they'd be harmless here)
    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("stage"), "n"
        )

    stats = (
        stage("1_input", docs)
        .unionByName(stage("2_quality", quality))
        .unionByName(stage("3_exact", exact))
        .unionByName(stage("4_curated", curated))
    )
    return {"curated": curated, "stats": stats}
