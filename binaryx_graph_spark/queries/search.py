"""Search queries for the correctness gate (SURVEY.md §2.3-2.4).

On ``documents`` (the engine's text corpus analog) plus micro-graph
VALUES oracles for the exact reference result shape
(uid, value, score, sample_count — src/models/nodes.rs:123-128).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import load_table
from ..operators.search import (
    RawQueryParser,
    build_posting_table,
    default_query_tokens,
    raw_query_predicate,
    score_expr,
    score_expr_weighted,
    search_functions,
    search_strings,
    sql_fuzzy,
    sql_proximity,
    sql_range,
    sql_score,
    sql_score_weighted,
    tokens_predicate,
)
from ..registry import register
from .ingest_demo import graph_tables
from ..fixtures.micro_graph import HASH_A, UID_HELPER_A

_PATTERN = "spark merge"
_TOKENS = default_query_tokens(_PATTERN)


@register(
    "fulltext_search_default",
    oracle=f"""
    SELECT doc_id, {sql_score('text', _TOKENS)} AS score
    FROM documents
    WHERE lower(text) LIKE '%spark%' AND lower(text) LIKE '%merge%'
    ORDER BY score DESC, doc_id
    LIMIT 25
    """,
    tags=("search", "headline"),
)
def fulltext_search_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: default query builder — every whitespace token must match
    case-insensitively (`*tok*` AND-chain, query.rs:113-136); deterministic
    occurrence-count score, ordered top-k (K1)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(tokens_predicate(F.col("text"), _TOKENS))
        .select("doc_id", score_expr(F.col("text"), _TOKENS).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(25)
    )


@register(
    "fulltext_sample_count",
    oracle=f"""
    SELECT text AS value,
           count(DISTINCT source) AS sample_count,
           {sql_score('text', ['bitcoin'])} AS score
    FROM documents
    WHERE lower(text) LIKE '%window%' AND lower(text) LIKE '%scan%'
    GROUP BY text
    ORDER BY sample_count DESC, value
    LIMIT 20
    """,
    tags=("search",),
)
def fulltext_sample_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 shape: hits + ownership join + `count(DISTINCT b) AS sample_count`
    (importer.rs:389-397) — documents stand in for strings, sources for
    binaries."""
    docs = load_table(spark, sf_dir, "documents")
    toks = ["window", "scan"]
    return (
        docs.filter(tokens_predicate(F.col("text"), toks))
        .groupBy(F.col("text").alias("value"))
        .agg(F.countDistinct("source").alias("sample_count"))
        .withColumn("score", score_expr(F.col("value"), ["bitcoin"]))
        .orderBy(F.desc("sample_count"), "value")
        .limit(20)
    )


@register(
    "raw_query_search",
    oracle="""
    SELECT doc_id
    FROM documents
    WHERE (lower(text) LIKE '%join%' AND lower(text) LIKE '%merge%')
       OR (lower(text) LIKE '%hash agg%' AND NOT lower(text) LIKE '%window%')
    ORDER BY doc_id
    """,
    tags=("search",),
)
def raw_query_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: `--raw` Lucene-subset query — booleans, parens, quoted phrase
    (query.rs:206-210); compiled to Catalyst predicates."""
    docs = load_table(spark, sf_dir, "documents")
    pred = raw_query_predicate(F.col("text"), '(join AND merge) OR "hash agg" NOT window')
    return docs.filter(pred).select("doc_id").orderBy("doc_id")


@register(
    "raw_query_fuzzy",
    oracle=f"""
    SELECT doc_id
    FROM documents
    WHERE ({sql_fuzzy('text', 'mergee', 1)} AND lower(text) LIKE '%scan%')
       OR {sql_fuzzy('text', 'vektor', 2)}
    ORDER BY doc_id
    """,
    tags=("search",),
)
def raw_query_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 fuzzy: Lucene ``term~N`` — token-level Levenshtein match (any
    whitespace token of the value within edit distance N), composed with
    booleans. ``mergee~1`` reaches 'merge'/'merges', ``vektor~`` (bare ~
    = 2) reaches 'vector' — the capability the reference gets from
    Lucene's fuzzy index (query.rs:206-210), expressed as a pure Column
    predicate (codegen Levenshtein per token, no UDF)."""
    docs = load_table(spark, sf_dir, "documents")
    pred = raw_query_predicate(F.col("text"), "(mergee~1 AND scan) OR vektor~")
    return docs.filter(pred).select("doc_id").orderBy("doc_id")


@register(
    "raw_query_range",
    oracle=f"""
    SELECT doc_id
    FROM documents
    WHERE ({sql_range('text', 'dup', 'dzz')} AND lower(text) LIKE '%spark%')
       OR {sql_range('text', 'value', 'vector', incl_lo=False, incl_hi=False)}
    ORDER BY doc_id
    """,
    tags=("search",),
)
def raw_query_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 ranges: Lucene ``[lo TO hi]`` / ``{lo TO hi}`` — term-level
    lexicographic range match (any whitespace token in range), inclusive
    and exclusive ends, composed with booleans. ``[dup TO dzz]`` reaches
    the rare 'dup*' tokens; the exclusive ``{value TO vector}`` matches
    only tokens strictly between — the capability the reference gets from
    Lucene's TermRangeQuery (query.rs:206-210), as a pure Column
    predicate over the token array (no UDF)."""
    docs = load_table(spark, sf_dir, "documents")
    pred = raw_query_predicate(
        F.col("text"), "([dup TO dzz] AND spark) OR {value TO vector}"
    )
    return docs.filter(pred).select("doc_id").orderBy("doc_id")


@register(
    "raw_query_proximity",
    oracle=f"""
    SELECT doc_id
    FROM documents
    WHERE ({sql_proximity('text', ['dup', 'merge'], 3)})
       OR ({sql_proximity('text', ['spark', 'scan'], 0)} AND NOT lower(text) LIKE '%window%')
    ORDER BY doc_id
    """,
    tags=("search",),
)
def raw_query_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 proximity: Lucene ``"a b"~N`` — all phrase terms within a
    window of len+N tokens (unordered approximation of the sloppy
    PhraseQuery, documented divergence on ordering), composed with
    booleans. The whole raw Lucene core syntax — booleans, phrases,
    wildcards, fuzzy, ranges, boosts, proximity — now compiles to
    Catalyst predicates."""
    docs = load_table(spark, sf_dir, "documents")
    pred = raw_query_predicate(
        F.col("text"), '"dup merge"~3 OR ("spark scan"~0 NOT window)'
    )
    return docs.filter(pred).select("doc_id").orderBy("doc_id")


_BOOST_PATTERN = "dup^5 OR spark"


@register(
    "raw_query_boost",
    oracle=f"""
    SELECT doc_id,
           {sql_score_weighted('text', [('dup', 5.0), ('spark', 1.0)])} AS score
    FROM documents
    WHERE lower(text) LIKE '%dup%' OR lower(text) LIKE '%spark%'
    ORDER BY score DESC, doc_id
    LIMIT 25
    """,
    tags=("search",),
)
def raw_query_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 boosts: Lucene ``term^N`` — matching is unchanged, but the
    boosted term's occurrence count is weighted N× in the relevance
    score, so 'dup'-heavy documents outrank 'spark'-heavy ones at 5:1
    (query.rs:206-210 passes boosts to Lucene's scorer; here the
    deterministic occurrence-count score makes the boost reproducible
    and oracle-checkable)."""
    docs = load_table(spark, sf_dir, "documents")
    parser = RawQueryParser(_BOOST_PATTERN)
    pred = parser.parse(F.col("text"))
    return (
        docs.filter(pred)
        .select(
            "doc_id",
            score_expr_weighted(F.col("text"), parser.scoring_terms).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(25)
    )


@register(
    "wildcard_search",
    oracle="""
    SELECT doc_id
    FROM documents
    WHERE lower(text) LIKE '%agg%regat%' OR lower(text) LIKE '%filt%'
    ORDER BY doc_id
    """,
    tags=("search",),
)
def wildcard_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 wildcards: `*` inside raw terms maps to LIKE %."""
    docs = load_table(spark, sf_dir, "documents")
    pred = raw_query_predicate(F.col("text"), "agg*regat OR filt*")
    return docs.filter(pred).select("doc_id").orderBy("doc_id")


@register(
    "posting_table_topdf",
    oracle=r"""
    SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
    FROM (
      SELECT t.term, d.doc_id, count(*) AS tf
      FROM documents d, unnest(regexp_split_to_array(lower(d.text), '\s+')) AS t(term)
      WHERE t.term <> ''
      GROUP BY t.term, d.doc_id
    )
    GROUP BY term
    ORDER BY df DESC, term
    LIMIT 30
    """,
    tags=("search",),
)
def posting_table_topdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived inverted index (the Lucene-index stand-in, schema.rs:51):
    posting(term, doc, tf) built distributed; top terms by document
    frequency."""
    docs = load_table(spark, sf_dir, "documents")
    posting = build_posting_table(docs, "doc_id", "text")
    return (
        posting.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf"))
        .orderBy(F.desc("df"), "term")
        .limit(30)
    )


# ------------------------------------------------------- micro-graph exact


@register(
    "mg_string_search",
    oracle="""
    SELECT 'str:' || sha256('Pay Bitcoin') AS uid,
           'Pay Bitcoin' AS value,
           CAST(1.0 AS DOUBLE) AS score,
           CAST(2 AS BIGINT) AS sample_count
    """,
    tags=("search",),
)
def mg_string_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 end-to-end on the graph warehouse: 'Bitcoin' hits one global
    string node contained by BOTH binaries → sample_count 2
    (FIXTURES.md §3 invariant)."""
    t = graph_tables(spark)
    return search_strings(t["strings"], t["contains_string"], "Bitcoin", limit=10)


@register(
    "mg_function_search",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{UID_HELPER_A}', 'helper', 'Internal')
    ) AS t(uid, name, type)
    """,
    tags=("search",),
)
def mg_function_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: substring search 'elp' scoped to binary A via the
    CONTAINS∪IMPORTS membership semi-join (importer.rs:322-376)."""
    t = graph_tables(spark)
    out = search_functions(
        t["functions"], t["contains"], t["imports"], "elp",
        binary_filter="mal_a", binaries=t["binaries"], limit=50,
    )
    return out.select("uid", "name", "type")


@register(
    "mg_string_search_scoped",
    oracle="""
    SELECT 'str:' || sha256('Pay Bitcoin') AS uid,
           'Pay Bitcoin' AS value,
           CAST(1.0 AS DOUBLE) AS score,
           CAST(1 AS BIGINT) AS sample_count
    """,
    tags=("search",),
)
def mg_string_search_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 with the binary filter arm: scoping the search to binary B
    (filename contains 'mal_b') drops the sample_count from 2 to 1 —
    the ownership semi-join through the scoped CONTAINS_STRING edges
    (importer.rs:392-397)."""
    t = graph_tables(spark)
    return search_strings(
        t["strings"], t["contains_string"], "Bitcoin",
        binary_filter="mal_b", binaries=t["binaries"], limit=10,
    )
