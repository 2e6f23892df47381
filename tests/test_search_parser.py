"""Raw-query parser robustness (T3) + escaping (T1) unit cases."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.operators.search import (
    default_query_tokens,
    escape_lucene,
    raw_query_predicate,
)


def _matches(spark, pattern: str, values: list[str]) -> set[str]:
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return {r["v"] for r in df.filter(raw_query_predicate(F.col("v"), pattern)).collect()}


VALUES = ["alpha beta", "alpha", "beta gamma", "delta", "ALPHA BETA GAMMA"]


def test_escape_lucene_specials():
    assert escape_lucene("a+b") == "a\\+b"
    assert escape_lucene('q"x"') == 'q\\"x\\"'
    assert escape_lucene("plain") == "plain"


def test_default_tokens():
    assert default_query_tokens("  foo   bar ") == ["foo", "bar"]
    assert default_query_tokens("") == []


def test_parser_and_or_precedence(spark):
    # AND binds tighter: alpha OR beta AND gamma == alpha OR (beta AND gamma)
    got = _matches(spark, "alpha OR beta AND gamma", VALUES)
    assert got == {"alpha beta", "alpha", "beta gamma", "ALPHA BETA GAMMA"}


def test_parser_not(spark):
    got = _matches(spark, "alpha NOT beta", VALUES)
    assert got == {"alpha"}


def test_parser_phrase_case_insensitive(spark):
    got = _matches(spark, '"alpha beta"', VALUES)
    assert got == {"alpha beta", "ALPHA BETA GAMMA"}


def test_parser_wildcard(spark):
    got = _matches(spark, "al*a", VALUES)
    assert {"alpha beta", "alpha", "ALPHA BETA GAMMA"} <= got


def test_parser_unbalanced_paren_is_tolerated(spark):
    # missing close paren: parser consumes what it can, no crash
    got = _matches(spark, "(alpha OR beta", VALUES)
    assert "delta" not in got and "alpha" in got


def test_parser_empty_matches_all(spark):
    assert _matches(spark, "", VALUES) == set(VALUES)


def test_parser_only_not(spark):
    got = _matches(spark, "NOT alpha", VALUES)
    assert got == {"beta gamma", "delta"}


def test_raw_query_rejects_unsupported_lucene(spark):
    """Lucene-only constructs fail loudly (documented divergence), never
    silently degrade to substring matches."""
    import pytest
    from pyspark.sql import functions as F
    from binaryx_graph_spark.operators.search import raw_query_predicate

    col = F.col("x")
    for bad in [
        "price~0.8",          # legacy fractional fuzziness
        "roam~3",             # beyond Lucene's edit-distance cap
        "ro*m~",              # fuzzy + wildcard
        '"a b"~',             # bare phrase proximity (no distance)
        '"a b"~1.5',          # fractional phrase proximity
        "~foo",               # reserved ~-leading standalone token
        "alpha ~2",           # dangling proximity (no phrase before it)
        "alpha ^2",           # dangling boost (space-detached)
        "[alpha TO]",         # malformed range (missing hi)
        "x [b TO c",          # malformed range (unclosed)
    ]:
        with pytest.raises(ValueError):
            raw_query_predicate(col, bad)
    # quoted phrases keep these characters literal; colon terms are literal substrings
    raw_query_predicate(col, '"version~2" AND imp:kernel32')
    # bracket-leading identifiers WITHOUT TO stay literal terms
    raw_query_predicate(col, "{anonymous}::ns AND [ordinal]0")
    # a phrase may contain bracket+TO text without tripping the range check
    raw_query_predicate(col, '"see [a TO b in docs"')


def test_parser_bracket_literals_match(spark):
    vals = ["{anonymous}::ns here", "plain text"]
    assert _matches(spark, "{anonymous}::ns", vals) == {"{anonymous}::ns here"}


def test_parser_proximity_multiplicity(spark):
    """Repeated phrase terms need repeated occurrences in the window."""
    vals = ["foo bar", "foo foo bar", "foo x foo"]
    assert _matches(spark, '"foo foo"~0', vals) == {"foo foo bar"}
    assert _matches(spark, '"foo foo"~1', vals) == {"foo foo bar", "foo x foo"}


def test_parser_range_matches_tokens(spark):
    """[lo TO hi] matches values with a whitespace token in the
    lexicographic range; {..} ends are exclusive; * = open end."""
    vals = ["alpha beta dup", "small slow sort", "dupster zebra", "delta"]
    assert _matches(spark, "[dup TO dzz]", vals) == {"alpha beta dup", "dupster zebra"}
    assert _matches(spark, "{dup TO dzz}", vals) == {"dupster zebra"}
    assert _matches(spark, "[* TO beta]", vals) == {"alpha beta dup"}
    assert _matches(spark, "[t TO *]", vals) == {"dupster zebra"}
    # mixed brackets: [dup TO dupster} excludes the hi end exactly
    assert _matches(spark, "[dup TO dupster}", vals) == {"alpha beta dup"}
    # composes with booleans
    assert _matches(spark, "[dup TO dzz] AND NOT zebra", vals) == {"alpha beta dup"}


def test_parser_proximity_window(spark):
    """\"a b\"~N: all phrase terms within a window of len+N tokens,
    any order (unordered sloppy-phrase approximation)."""
    vals = ["alpha beta g", "alpha x beta", "alpha x y z beta", "beta alpha", "alpha"]
    assert _matches(spark, '"alpha beta"~0', vals) == {"alpha beta g", "beta alpha"}
    assert _matches(spark, '"alpha beta"~1', vals) == {
        "alpha beta g", "alpha x beta", "beta alpha"
    }
    assert _matches(spark, '"alpha beta"~3', vals) == {
        "alpha beta g", "alpha x beta", "alpha x y z beta", "beta alpha"
    }
    # composes with booleans; scoring terms are the phrase terms
    from binaryx_graph_spark.operators.search import RawQueryParser
    from pyspark.sql import functions as F

    p = RawQueryParser('"alpha beta"~2^3 AND g')
    p.parse(F.col("x"))
    assert p.scoring_terms == [("alpha", 3.0), ("beta", 3.0), ("g", 1.0)]


def test_parser_boost_matches_and_weights_score(spark):
    """term^N matches like term; the parser collects boost-weighted
    scoring terms (negated clauses never score)."""
    from binaryx_graph_spark.operators.search import RawQueryParser
    from pyspark.sql import functions as F

    p = RawQueryParser('alpha^2 OR "beta gamma"^3 OR ok~1^4')
    p.parse(F.col("x"))
    assert p.scoring_terms == [("alpha", 2.0), ("beta gamma", 3.0), ("ok", 4.0)]

    p2 = RawQueryParser("alpha NOT bad^9")
    p2.parse(F.col("x"))
    assert p2.scoring_terms == [("alpha", 1.0)]

    vals = ["alpha beta", "beta gamma", "delta"]
    assert _matches(spark, "alpha^2 OR delta^0.5", vals) == {"alpha beta", "delta"}


def test_parser_fuzzy_matches_close_tokens(spark):
    """term~N matches values with a token within Levenshtein N; bare ~
    defaults to 2 (Lucene's cap)."""
    vals = ["alpha beta", "alpho beta", "alXho beta", "delta"]
    got = _matches(spark, "alpha~1", vals)
    assert got == {"alpha beta", "alpho beta"}
    got2 = _matches(spark, "alpha~", vals)
    assert got2 == {"alpha beta", "alpho beta", "alXho beta"}
    got0 = _matches(spark, "alpha~0", vals)
    assert got0 == {"alpha beta"}


def test_parser_fuzzy_composes_with_booleans(spark):
    vals = ["alpha beta", "alpho beta", "delta"]
    got = _matches(spark, "alpha~1 NOT beta", vals)
    assert got == set()
    got2 = _matches(spark, "alpha~1 OR delta", vals)
    assert got2 == {"alpha beta", "alpho beta", "delta"}
