"""Search operators (SURVEY.md §2.3 F1-F4 + §2.4 T1-T5).

The reference's string search is a Lucene fulltext index inside Neo4j
(`db.index.fulltext.queryNodes`, /root/reference/src/neo4j/importer.rs:378-429)
fed by a driver-side query builder (/root/reference/src/commands/query.rs:98-136).
Here the index is unnecessary for correctness — predicates push down to the
parquet scan — and a derived posting table covers index-style workloads.

Scoring: Lucene's BM25 is not reproducible bit-for-bit (SURVEY.md §7.3 #6);
we define a deterministic, SQL-expressible score:

    score(value, tokens) = Σ_tok occurrences(lower(value), tok)

(total case-insensitive substring occurrence count — a pure-TF proxy;
ordering is the observable, and ties break on the sort key.)
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------------ T1 + T2

LUCENE_SPECIALS = set('+-&|!(){}[]^"~*?:\\/')


def escape_lucene(term: str) -> str:
    """T1: escape Lucene specials (query.rs:98-111). Driver-side."""
    return "".join(("\\" + ch) if ch in LUCENE_SPECIALS else ch for ch in term)


def default_query_tokens(pattern: str) -> list[str]:
    """T2: trim + whitespace-split; each token is matched `*tok*` and all
    tokens are ANDed; empty pattern → match-all (query.rs:113-136)."""
    return [t for t in pattern.strip().split() if t]


def tokens_predicate(col: Column, tokens: list[str]) -> Column:
    """Every token must appear as a case-insensitive substring.
    Empty token list → match-all (F3 semantics, query.rs:115-117)."""
    pred = F.lit(True)
    for tok in tokens:
        pred = pred & F.lower(col).contains(tok.lower())
    return pred


def occurrences(col: Column, token: str) -> Column:
    """Case-insensitive substring occurrence count — pure Column math:
    (len(v) - len(remove(v, tok))) / len(tok)."""
    lv = F.lower(col)
    lt = token.lower()
    return (F.length(lv) - F.length(F.replace(lv, F.lit(lt), F.lit("")))) / F.lit(len(lt))


def score_expr(col: Column, tokens: list[str]) -> Column:
    """Deterministic relevance: total occurrence count over all tokens."""
    if not tokens:
        return F.lit(0.0)
    s = occurrences(col, tokens[0])
    for tok in tokens[1:]:
        s = s + occurrences(col, tok)
    return s.cast("double")


def sql_score(expr: str, tokens: list[str]) -> str:
    """DuckDB twin of :func:`score_expr` — keep in sync."""
    if not tokens:
        return "0.0"
    parts = [
        f"(length(lower({expr})) - length(replace(lower({expr}), '{t.lower()}', '')))"
        f" / {len(t)}"
        for t in tokens
    ]
    return "CAST(" + " + ".join(parts) + " AS DOUBLE)"


def score_expr_weighted(col: Column, terms: list[tuple[str, float]]) -> Column:
    """Boost-aware relevance: Σ weight × occurrence-count. With all
    weights 1.0 this equals :func:`score_expr`. Terms come from
    :attr:`RawQueryParser.scoring_terms`."""
    if not terms:
        return F.lit(0.0)
    s = None
    for term, w in terms:
        contrib = occurrences(col, term) * F.lit(float(w))
        s = contrib if s is None else s + contrib
    return s.cast("double")


def sql_score_weighted(expr: str, terms: list[tuple[str, float]]) -> str:
    """DuckDB twin of :func:`score_expr_weighted` — keep in sync."""
    if not terms:
        return "0.0"
    parts = []
    for t, w in terms:
        q = t.lower().replace("'", "''")
        parts.append(
            f"((length(lower({expr})) - length(replace(lower({expr}), '{q}', '')))"
            f" / {len(t)} * {float(w)!r})"
        )
    return "CAST(" + " + ".join(parts) + " AS DOUBLE)"


# ----------------------------------------------------------------------- T3

# the range alternative requires a literal " TO " so that bracket-leading
# identifiers ({anonymous}::ns, [ordinal]0) still tokenize as single
# literal terms exactly like before ranges existed
_TOKEN_RE = re.compile(
    r'\s*(\(|\)|AND\b|OR\b|NOT\b|"[^"]*"|[\[{][^\]}]*\sTO\s[^\]}]*[\]}]|[^\s()]+)',
    re.IGNORECASE,
)


class RawQueryParser:
    """T3: minimal Lucene-subset parser for ``--raw`` mode
    (query.rs:206-210; README.md:89). Supported subset (documented
    divergence — full Lucene is out of scope):

    - ``AND`` / ``OR`` / ``NOT`` (left-assoc; AND binds tighter than OR)
    - parentheses
    - ``"quoted phrase"`` → case-insensitive substring
    - ``term`` → case-insensitive substring; ``*`` wildcards inside a term
      map to SQL ``LIKE %``
    - fuzzy ``term~`` / ``term~N`` (N ∈ 0..2, bare ``~`` = 2, Lucene's
      cap): matches when ANY whitespace token of the value is within
      Levenshtein N of the term — term-level fuzziness like Lucene's
      (which matches index terms), with the same whitespace tokenizer
      the default query builder uses
    - ranges ``[a TO b]`` (inclusive), ``{a TO b}`` (exclusive), mixed
      brackets, ``*`` for an open end: matches when ANY whitespace token
      of the value falls lexicographically within the range
      (case-insensitive) — term-level like Lucene's TermRangeQuery
    - boosts ``term^N`` / ``"phrase"^N`` / ``term~1^N`` (integer or
      decimal N ≥ 0): matching is unchanged; the boosted term's
      occurrence count is weighted by N in the relevance score
      (collected in :attr:`scoring_terms`, consumed by
      :func:`search_strings`)
    - phrase proximity ``"a b"~N`` (integer N): all phrase terms within
      a window of ``len(terms) + N`` tokens, ANY order but WITH
      multiplicity (``"foo foo"~N`` needs two occurrences) — the
      unordered approximation of Lucene's sloppy PhraseQuery (which
      charges edit-distance moves, so ``"b a"`` costs 2 under Lucene
      but 0 here; documented divergence). Composable with ``^W`` boosts.
    - bracket-leading terms WITHOUT ``TO`` (``{anonymous}::ns``,
      ``[ordinal]0``) stay literal substring matches — this domain's
      identifiers use brackets
    - implicit adjacency = AND

    UNSUPPORTED Lucene constructs (the reference passes ``--raw`` straight
    to Neo4j's Lucene index, query.rs:206-210; we implement a subset and
    REJECT the rest loudly rather than silently degrading):

    - fuzzy distance > 2 or fractional (legacy float fuzziness),
      or fuzzy combined with ``*`` wildcards → ValueError
    - non-integer / bare phrase proximity (``"a b"~``, ``"a b"~1.5``),
      other ``~``-leading standalone tokens, and dangling ``~N`` / ``^N``
      modifiers with nothing to modify → ValueError
    - malformed ranges — a bracket span MENTIONING ``TO`` that is not a
      well-formed ``[lo TO hi]`` (``[a TO]``, unclosed ``[b TO c``) →
      ValueError
    - field queries ``field:term`` are NOT treated as field queries:
      this domain's identifiers contain colons (``imp:kernel32:CreateFileA``),
      so a ``:`` term is matched as a literal substring — documented
      divergence (Lucene would search a field named ``field``).

    Divergence from Lucene: ``NOT`` binds to the following clause within
    its AND-chain (``a OR b NOT c`` = ``a OR (b AND NOT c)``), whereas a
    Lucene BooleanQuery applies MUST_NOT at the whole-query level
    (``(a OR b) AND NOT c``). Parenthesize to force either reading.
    """

    _FUZZY_RE = re.compile(r"^(.+?)~(\d+(\.\d+)?)?$")
    _RANGE_TOKEN_RE = re.compile(r"^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$", re.IGNORECASE)
    _BOOST_SPLIT_RE = re.compile(r"^(.+?)\^(\d+(?:\.\d+)?)$")
    _POSTBOOST_RE = re.compile(r"^\^(\d+(?:\.\d+)?)$")
    _POSTPROX_RE = re.compile(r"^~(\d+)$")

    def __init__(self, pattern: str):
        # Pattern-level malformed-range check: any bracket-opened span
        # that mentions TO must be a well-formed range. Bracket spans
        # WITHOUT a TO are literal terms (brace-leading identifiers like
        # {anonymous}::ns are real search targets in this domain).
        unquoted = re.sub(r'"[^"]*"', " ", pattern)  # phrases are literal
        for m in re.finditer(r"[\[{][^\]}]*", unquoted):
            frag = m.group(0)
            if re.search(r"\sTO(\s|$)", frag, re.IGNORECASE):
                close = unquoted[m.end() : m.end() + 1]
                if close not in "]}" or not self._RANGE_TOKEN_RE.match(frag + close):
                    raise ValueError(
                        f"malformed Lucene range in raw query: {frag + close!r} "
                        "(expected [lo TO hi] / {lo TO hi}; * for an open end)"
                    )
        self.tokens = [m.group(1) for m in _TOKEN_RE.finditer(pattern)]
        for tok in self.tokens:
            if tok.startswith('"') or self._POSTBOOST_RE.match(tok):
                continue  # quoted phrases are literal; ^N validated here
            if self._RANGE_TOKEN_RE.match(tok):
                continue  # well-formed range (pattern-level check above)
            if tok.startswith("~"):
                # standalone ~N = phrase-proximity modifier (context
                # checked at parse time); anything else ~-leading is
                # reserved and fails loudly ("a b"~ bare, ~1.5, ~foo)
                base, _w = self._split_boost(tok)
                if not self._POSTPROX_RE.match(base):
                    raise ValueError(
                        f"unsupported proximity modifier in raw query: {tok!r} "
                        '(use "a b"~N with integer N)'
                    )
                continue
            base, _w = self._split_boost(tok)
            if self._FUZZY_RE.match(base):
                self._parse_fuzzy(base)  # validates; raises on bad distance
        # (term, weight) pairs collected during parse() for the relevance
        # score — positive (non-NOT) phrases, plain terms and fuzzy bases;
        # wildcards and ranges match but do not score (no finite substring).
        self.scoring_terms: list[tuple[str, float]] = []
        self.pos = 0

    @classmethod
    def _split_boost(cls, tok: str) -> tuple[str, float]:
        """``term^N`` → (term, N); no boost → (tok, 1.0)."""
        m = cls._BOOST_SPLIT_RE.match(tok)
        if m:
            return m.group(1), float(m.group(2))
        return tok, 1.0

    @classmethod
    def _parse_fuzzy(cls, tok: str) -> tuple[str, int]:
        """``term~`` / ``term~N`` → (term, N); Lucene caps N at 2."""
        m = cls._FUZZY_RE.match(tok)
        base, dist = m.group(1), m.group(2)
        if dist is not None and "." in dist:
            raise ValueError(
                f"unsupported legacy fractional fuzziness in raw query: {tok!r} "
                "(use term~0, term~1 or term~2)"
            )
        n = 2 if dist is None or dist == "" else int(dist)
        if n > 2:
            raise ValueError(
                f"unsupported fuzzy distance {n} in raw query: {tok!r} (Lucene caps at 2)"
            )
        if "*" in base:
            raise ValueError(
                f"fuzzy cannot combine with wildcards in raw query: {tok!r}"
            )
        return base, n

    def _peek(self) -> str | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def _next(self) -> str:
        tok = self.tokens[self.pos]
        self.pos += 1
        return tok

    def parse(self, col: Column) -> Column:
        if not self.tokens:
            return F.lit(True)
        self.pos = 0
        self.scoring_terms = []
        self._neg_depth = 0
        out = self._or(col)
        return out

    def _or(self, col: Column) -> Column:
        left = self._and(col)
        while self._peek() and self._peek().upper() == "OR":
            self._next()
            left = left | self._and(col)
        return left

    def _and(self, col: Column) -> Column:
        left = self._unary(col)
        while True:
            nxt = self._peek()
            if nxt is None or nxt.upper() == "OR" or nxt == ")":
                return left
            if nxt.upper() == "AND":
                self._next()
                nxt = self._peek()
                if nxt is None:
                    return left
            left = left & self._unary(col)

    def _unary(self, col: Column) -> Column:
        tok = self._peek()
        if tok is not None and tok.upper() == "NOT":
            self._next()
            self._neg_depth += 1
            try:
                return ~self._unary(col)
            finally:
                self._neg_depth -= 1
        return self._primary(col)

    def _score_term(self, text: str, weight: float) -> None:
        """Record a positive scoring term (negated clauses never score)."""
        if self._neg_depth % 2 == 0 and text:
            self.scoring_terms.append((text, weight))

    def _consume_postboost(self) -> float:
        """Consume a standalone ``^N`` token following a phrase or range
        (the tokenizer splits ``"a b"^2`` / ``[a TO b]^2`` in two)."""
        nxt = self._peek()
        if nxt is not None:
            m = self._POSTBOOST_RE.match(nxt)
            if m:
                self._next()
                return float(m.group(1))
        return 1.0

    def _consume_phrase_mods(self) -> tuple[int | None, float]:
        """After a quoted phrase: optional ``~N`` proximity and ``^W``
        boost (the tokenizer splits them off) → (slop or None, weight)."""
        nxt = self._peek()
        if nxt is None:
            return None, 1.0
        m = self._POSTBOOST_RE.match(nxt)
        if m:
            self._next()
            return None, float(m.group(1))
        if nxt.startswith("~"):
            base, w = self._split_boost(nxt)  # "~2^3" → ("~2", 3.0)
            m2 = self._POSTPROX_RE.match(base)
            if not m2:  # unreachable: __init__ validated ~-leading tokens
                raise ValueError(f"unsupported proximity modifier: {nxt!r}")
            self._next()
            if w == 1.0:
                w = self._consume_postboost()  # '"a b"~2 ^3' spaced form
            return int(m2.group(1)), w
        return None, 1.0

    def _primary(self, col: Column) -> Column:
        tok = self._next()
        if tok == "(":
            inner = self._or(col)
            if self._peek() == ")":
                self._next()
            return inner
        if tok.startswith('"') and tok.endswith('"'):
            phrase = tok[1:-1]
            slop, weight = self._consume_phrase_mods()
            if slop is None:
                self._score_term(phrase, weight)
                return F.lower(col).contains(phrase.lower())
            terms = [t for t in phrase.lower().split() if t]
            for t in terms:
                self._score_term(t, weight)
            if not terms:
                return F.lit(True)
            return proximity_predicate(col, terms, slop)
        m = self._RANGE_TOKEN_RE.match(tok)
        if m:
            self._consume_postboost()  # ranges match but do not score
            lo = None if m.group(2) == "*" else m.group(2)
            hi = None if m.group(3) == "*" else m.group(3)
            return range_predicate(
                col, lo, hi, incl_lo=m.group(1) == "[", incl_hi=m.group(4) == "]"
            )
        if self._POSTBOOST_RE.match(tok) or (
            tok.startswith("~") and self._POSTPROX_RE.match(self._split_boost(tok)[0])
        ):
            # a ~N / ^N modifier with nothing to modify would otherwise
            # fall through to a literal-substring match — fail loudly
            raise ValueError(
                f"dangling modifier in raw query: {tok!r} "
                "(~N follows a quoted phrase, ^N follows a term/phrase/range)"
            )
        tok, weight = self._split_boost(tok)
        if self._FUZZY_RE.match(tok):
            base, n = self._parse_fuzzy(tok)
            self._score_term(base, weight)
            return fuzzy_predicate(col, base, n)
        if "*" in tok:
            # wildcard term → LIKE with % (escape SQL specials first);
            # matches but does not score (no finite substring to count)
            body = tok.lower().replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
            return F.lower(col).like("%" + body.replace("*", "%") + "%")
        self._score_term(tok, weight)
        return F.lower(col).contains(tok.lower())


def fuzzy_predicate(col: Column, term: str, max_dist: int = 2) -> Column:
    """Term-level fuzzy match: ANY whitespace token of the value within
    Levenshtein ``max_dist`` of ``term`` (case-insensitive). A pure
    Column expression — the Levenshtein DP runs inside codegen per
    token, no UDF. Single-space split matches the DuckDB twin
    (:func:`sql_fuzzy`) exactly, empty tokens included (they only match
    terms of length ≤ max_dist, identically on both engines)."""
    return F.exists(
        F.split(F.lower(col), " "),
        lambda t: F.levenshtein(t, F.lit(term.lower())) <= F.lit(int(max_dist)),
    )


def sql_fuzzy(expr: str, term: str, max_dist: int = 2) -> str:
    """DuckDB twin of :func:`fuzzy_predicate` — keep in sync."""
    t = term.lower().replace("'", "''")
    return (
        f"len(list_filter(string_split(lower({expr}), ' '), "
        f"t -> levenshtein(t, '{t}') <= {int(max_dist)})) > 0"
    )


def proximity_predicate(col: Column, phrase_terms: list[str], slop: int) -> Column:
    """Phrase proximity ``"a b"~N``: all phrase terms occur (in any
    order, WITH multiplicity — ``"foo foo"~N`` needs two occurrences)
    within a window of ``len(terms) + N`` whitespace tokens.
    Documented divergence from Lucene's sloppy PhraseQuery: Lucene
    charges edit-distance moves (order matters, a transposition costs
    2); the unordered window is the standard approximation and is
    engine-portable. Pure Column — nested codegen lambdas over the
    token array, no UDF; O(n_tokens × k × window) comparisons."""
    from collections import Counter

    need = Counter(t.lower() for t in phrase_terms)
    k = len(phrase_terms)
    w = k + int(slop)
    toks = F.split(F.lower(col), " ")
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)))

    def _count_in(arr: Column, t: str) -> Column:
        return F.size(F.filter(arr, lambda x: x == F.lit(t)))

    def _window_has_all(s: Column) -> Column:
        win = F.slice(toks, s + 1, w)
        pred = F.lit(True)
        for t, c in need.items():
            pred = pred & (
                F.array_contains(win, t) if c == 1 else (_count_in(win, t) >= c)
            )
        return pred

    # cheap containment pre-gate: AND short-circuits in codegen, so the
    # O(n_tokens × k × window) window scan only runs on documents that
    # contain every term at all (necessary condition, ~5× cheaper filter)
    gate = F.lit(True)
    for t, c in need.items():
        gate = gate & (
            F.array_contains(toks, t) if c == 1 else (_count_in(toks, t) >= c)
        )
    return gate & F.exists(starts, _window_has_all)


def sql_proximity(expr: str, phrase_terms: list[str], slop: int) -> str:
    """DuckDB twin of :func:`proximity_predicate` — keep in sync.
    ``list_slice`` clips at the array end exactly like Spark's
    ``slice``; ``range(0, n)`` is end-exclusive = Spark's inclusive
    ``sequence(0, n-1)``."""
    from collections import Counter

    need = Counter(t.lower() for t in phrase_terms)
    k = len(phrase_terms)
    w = k + int(slop)
    toks = f"string_split(lower({expr}), ' ')"

    def _cond(arr: str, t: str, c: int) -> str:
        q = t.replace("'", "''")
        if c == 1:
            return f"list_contains({arr}, '{q}')"
        return f"len(list_filter({arr}, x -> x = '{q}')) >= {c}"

    conds = " AND ".join(
        _cond(f"list_slice({toks}, s+1, s+{w})", t, c) for t, c in need.items()
    )
    gate = " AND ".join(_cond(toks, t, c) for t, c in need.items())
    return f"({gate} AND len(list_filter(range(0, len({toks})), s -> {conds})) > 0)"


def range_predicate(
    col: Column,
    lo: str | None,
    hi: str | None,
    *,
    incl_lo: bool = True,
    incl_hi: bool = True,
) -> Column:
    """Term-level range match (Lucene TermRangeQuery analog): ANY
    whitespace token of lower(value) lexicographically within
    [lo, hi] (case-insensitive; ``None`` = open end). Pure Column —
    the comparison runs inside codegen per token, no UDF. Single-space
    split matches :func:`sql_range` exactly."""
    lo_l = None if lo is None else lo.lower()
    hi_l = None if hi is None else hi.lower()

    def _in_range(t: Column) -> Column:
        # empty tokens (from repeated/leading/trailing spaces) are not
        # terms — without this, '' <= hi satisfies any open-low range
        p = t != F.lit("")
        if lo_l is not None:
            p = p & ((t >= F.lit(lo_l)) if incl_lo else (t > F.lit(lo_l)))
        if hi_l is not None:
            p = p & ((t <= F.lit(hi_l)) if incl_hi else (t < F.lit(hi_l)))
        return p

    return F.exists(F.split(F.lower(col), " "), _in_range)


def sql_range(
    expr: str,
    lo: str | None,
    hi: str | None,
    *,
    incl_lo: bool = True,
    incl_hi: bool = True,
) -> str:
    """DuckDB twin of :func:`range_predicate` — keep in sync."""
    conds = ["t <> ''"]
    if lo is not None:
        q = lo.lower().replace("'", "''")
        conds.append(f"t {'>=' if incl_lo else '>'} '{q}'")
    if hi is not None:
        q = hi.lower().replace("'", "''")
        conds.append(f"t {'<=' if incl_hi else '<'} '{q}'")
    body = " AND ".join(conds)
    return (
        f"len(list_filter(string_split(lower({expr}), ' '), "
        f"t -> {body})) > 0"
    )


def raw_query_predicate(col: Column, pattern: str) -> Column:
    return RawQueryParser(pattern).parse(col)


# ----------------------------------------------------------------------- T4

def search_strings(
    strings: DataFrame,
    contains_string: DataFrame,
    pattern: str,
    *,
    raw: bool = False,
    binary_filter: str | None = None,
    binaries: DataFrame | None = None,
    limit: int = 100,
) -> DataFrame:
    """T4: fulltext search + relevance + per-string distinct-binary count
    (importer.rs:378-429). Returns (uid, value, score, sample_count).

    ``binary_filter`` restricts to binaries whose filename contains it or
    whose hash equals it (needs ``binaries``).
    """
    if raw:
        parser = RawQueryParser(pattern)
        pred = parser.parse(F.col("value"))
        scoring = parser.scoring_terms  # boost-weighted, NOT-clauses excluded
    else:
        tokens = default_query_tokens(pattern)
        pred = tokens_predicate(F.col("value"), tokens)
        scoring = [(t, 1.0) for t in tokens]

    hits = strings.filter(pred)
    cs = contains_string
    if binary_filter is not None and binaries is not None:
        b = binaries.filter(
            F.col("filename").contains(binary_filter) | (F.col("hash") == binary_filter)
        ).select(F.col("hash").alias("binary_hash"))
        cs = cs.join(F.broadcast(b), "binary_hash", "left_semi")

    joined = hits.join(cs, hits.uid == cs.string_uid)
    return (
        joined.groupBy("uid", "value")
        .agg(F.countDistinct("binary_hash").alias("sample_count"))
        .withColumn("score", score_expr_weighted(F.col("value"), scoring))
        .select("uid", "value", "score", "sample_count")
        .orderBy(F.desc("score"), "uid")
        .limit(limit)
    )


# ----------------------------------------------------------------------- F1

def search_functions(
    functions: DataFrame,
    contains: DataFrame,
    imports: DataFrame,
    pattern: str,
    *,
    binary_filter: str | None = None,
    binaries: DataFrame | None = None,
    limit: int = 100,
) -> DataFrame:
    """F1: `name CONTAINS p OR uid CONTAINS p`, optional binary scope,
    effective limit = min(100, limit) — the reference hard-codes LIMIT 100
    in Cypher and takes `limit` client-side (importer.rs:322-376,
    query.rs:155). Empty pattern matches everything (F3)."""
    pred = (
        F.lit(True)
        if pattern == ""
        else F.col("name").contains(pattern) | F.col("uid").contains(pattern)
    )
    out = functions.filter(pred)
    if binary_filter is not None and binaries is not None:
        b = binaries.filter(
            F.col("filename").contains(binary_filter) | (F.col("hash") == binary_filter)
        ).select(F.col("hash").alias("binary_hash"))
        membership = (
            contains.select("binary_hash", "function_uid")
            .unionByName(imports.select("binary_hash", "function_uid"))
            .join(F.broadcast(b), "binary_hash", "left_semi")
            .select(F.col("function_uid").alias("uid"))
        )
        out = out.join(membership, "uid", "left_semi")
    return out.orderBy("uid").limit(min(100, limit))


# ---------------------------------------------------- posting table (index)

def build_posting_table(text_df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derived inverted index: (term, id, tf) — whitespace-tokenized,
    lowercased (the engine's stand-in for the reference's Lucene index,
    schema.rs:51). Distributed build: explode + groupBy, no driver data."""
    toks = text_df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
