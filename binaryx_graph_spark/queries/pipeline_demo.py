"""End-to-end curation pipeline gate query: the whole composed flow
(quality gate → exact dedup → near-dup clustering → retention stats)
recomputed independently by one DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import sql_jaccard_pairs
from ..operators.textstats import sql_quality_metrics
from ..pipeline import JACCARD_T, MIN_TOKENS, MIN_TTR, curate_documents
from ..registry import register

_QM = sql_quality_metrics("text")

_ORACLE = f"""
    WITH RECURSIVE
    quality AS (
      SELECT doc_id, text FROM documents
      WHERE {_QM['n_tokens']} >= {MIN_TOKENS}
        AND {_QM['type_token_ratio']} >= {MIN_TTR}
    ),
    keyed AS (
      SELECT doc_id, text,
             sha256(list_aggregate(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                               t -> t <> ''), 'string_agg', ' ')) AS k
      FROM quality
    ),
    exact AS (
      SELECT doc_id, text FROM keyed
      WHERE doc_id IN (SELECT min(doc_id) FROM keyed GROUP BY k)
    ),
    pairs AS ({sql_jaccard_pairs('exact', 'doc_id', 'text', n=3, threshold=JACCARD_T)}),
    edges AS (
      SELECT doc_a AS x, doc_b AS y FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(x, y) AS (
      SELECT x, y FROM edges
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON e.x = r.y
    ),
    dropped AS (
      SELECT x AS doc_id FROM reach GROUP BY x HAVING min(y) < x
    )
    SELECT '1_input' AS stage, count(*) AS n FROM documents
    UNION ALL SELECT '2_quality', count(*) FROM quality
    UNION ALL SELECT '3_exact', count(*) FROM exact
    UNION ALL SELECT '4_curated',
              (SELECT count(*) FROM exact) - (SELECT count(*) FROM dropped)
    ORDER BY stage
    """


@register("pipeline_curation_stats", oracle=_ORACLE, tags=("pipeline", "headline"))
def pipeline_curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline's per-stage retention counts —
    quality gate, exact dedup, near-dup clustering — all recomputed by
    one independent SQL flow. A regression in ANY stage breaks this."""
    return curate_documents(spark, sf_dir)["stats"].orderBy("stage")
