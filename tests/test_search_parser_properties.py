"""Differential property test for RawQueryParser: a small, independent
pure-Python evaluator of the documented raw-query semantics vs the
compiled Catalyst predicate, over hypothesis-generated patterns."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import given, settings
from hypothesis import strategies as st

from binaryx_graph_spark.operators.search import _TOKEN_RE, RawQueryParser

from pyspark.sql import functions as F

# ---------------------------------------------------------- reference eval


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class RefEval:
    """Independent evaluator of the documented semantics (plain Python
    string ops — no Spark, no shared code beyond the tokenizer)."""

    FUZZY = re.compile(r"^(.+?)~(\d+)?$")
    RANGE = re.compile(r"^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$", re.IGNORECASE)
    BOOST = re.compile(r"^(.+?)\^(\d+(?:\.\d+)?)$")
    POSTB = re.compile(r"^\^(\d+(?:\.\d+)?)$")
    POSTP = re.compile(r"^~(\d+)$")

    def __init__(self, pattern: str, value: str):
        self.toks = [m.group(1) for m in _TOKEN_RE.finditer(pattern)]
        self.pos = 0
        self.v = value.lower()
        self.words = self.v.split(" ")

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def eval(self) -> bool:
        if not self.toks:
            return True
        return self.e_or()

    def e_or(self):
        r = self.e_and()
        while self.peek() and self.peek().upper() == "OR":
            self.next()
            r2 = self.e_and()
            r = r or r2
        return r

    def e_and(self):
        r = self.e_unary()
        while True:
            n = self.peek()
            if n is None or n.upper() == "OR" or n == ")":
                return r
            if n.upper() == "AND":
                self.next()
                if self.peek() is None:
                    return r
            r2 = self.e_unary()
            r = r and r2

    def e_unary(self):
        if self.peek() is not None and self.peek().upper() == "NOT":
            self.next()
            return not self.e_unary()
        return self.e_primary()

    def e_primary(self):
        tok = self.next()
        if tok == "(":
            r = self.e_or()
            if self.peek() == ")":
                self.next()
            return r
        if tok.startswith('"') and tok.endswith('"'):
            phrase = tok[1:-1].lower()
            # optional ~N / ^W modifiers follow as separate tokens
            n = self.peek()
            slop = None
            if n is not None and self.POSTB.match(n):
                self.next()
            elif n is not None and n.startswith("~"):
                mb = self.BOOST.match(n)
                base = mb.group(1) if mb else n
                mp = self.POSTP.match(base)
                if mp:
                    self.next()
                    slop = int(mp.group(1))
                    if not mb and self.peek() and self.POSTB.match(self.peek()):
                        self.next()
            if slop is None:
                return phrase in self.v
            terms = [t for t in phrase.split() if t]
            if not terms:
                return True
            from collections import Counter

            need = Counter(terms)
            w = len(terms) + slop
            for s in range(len(self.words)):
                win = Counter(self.words[s : s + w])
                if all(win[t] >= c for t, c in need.items()):
                    return True
            return False
        m = self.RANGE.match(tok)
        if m:
            if self.peek() and self.POSTB.match(self.peek()):
                self.next()
            lo = None if m.group(2) == "*" else m.group(2).lower()
            hi = None if m.group(3) == "*" else m.group(3).lower()
            il, ih = m.group(1) == "[", m.group(4) == "]"
            for t in self.words:
                ok = t != ""
                if lo is not None:
                    ok = ok and (t >= lo if il else t > lo)
                if hi is not None:
                    ok = ok and (t <= hi if ih else t < hi)
                if ok:
                    return True
            return False
        mb = self.BOOST.match(tok)
        if mb:
            tok = mb.group(1)
        mf = self.FUZZY.match(tok)
        if mf and not (tok.startswith('"')):
            base = mf.group(1).lower()
            n = int(mf.group(2)) if mf.group(2) else 2
            return any(_lev(t, base) <= n for t in self.words)
        if "*" in tok:
            pat = ".*".join(re.escape(p) for p in tok.lower().split("*"))
            return re.search(pat, self.v, re.DOTALL) is not None
        return tok.lower() in self.v


# ------------------------------------------------------------- strategies

WORDS = ["alpha", "beta", "gamma", "dup", "alpho", "ga"]

term = st.sampled_from(
    WORDS
    + ["alpha~1", "alpho~", "dup~0", "al*a", "*eta", "dup^2", "alpha^3",
       "[alpha TO dup]", "{al TO gb}", "[* TO beta]", "[ga TO *]",
       '"alpha beta"', '"beta gamma"', '"alpha beta"~1', '"alpha gamma"~2',
       '"dup beta"~0^2', '"dup dup"~1', '"alpha alpha beta"~2']
)


def clause(children):
    return st.one_of(
        term,
        st.tuples(st.sampled_from(["AND", "OR"]), children, children).map(
            lambda t: f"({t[1]} {t[0]} {t[2]})"
        ),
        children.map(lambda c: f"NOT {c}"),
    )


patterns = st.recursive(term, clause, max_leaves=5)

values = st.lists(st.sampled_from(WORDS), min_size=0, max_size=6).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(pat=patterns, vals=st.lists(values, min_size=1, max_size=8, unique=True))
def test_parser_matches_reference_eval(spark, pat, vals):
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = {r.x for r in df.filter(RawQueryParser(pat).parse(F.col("x"))).collect()}
    want = {v for v in vals if RefEval(pat, v).eval()}
    assert got == want, f"pattern={pat!r}"
