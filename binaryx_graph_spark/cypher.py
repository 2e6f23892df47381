"""Cypher-subset compiler: the reference's query language, compiled to
DataFrame plans (reference queries throughout src/neo4j/importer.rs and
src/neo4j/call_path_analyzer.rs are written in exactly this subset).

A user of the reference can paste their Cypher and run it on this
engine: labels map to the node tables, relationship types to the edge
tables, and the MATCH chain compiles to equi-joins Catalyst optimizes
like any hand-written DataFrame plan (broadcast dimensions, pushed
filters — the compiler emits plain `filter`/`join`/`select`, nothing
opaque).

Supported subset (documented; reject-loudly beyond it):

- ``MATCH`` / restricted ``OPTIONAL MATCH`` (anchored on a bound variable,
  left-join semantics) linear patterns ``(a:Label {prop: lit})-[r:TYPE]->(b:...)``
  with ``<-`` direction, multi-type edges ``[:CONTAINS|IMPORTS]``,
  anonymous nodes/edges, and multiple MATCH clauses joined on shared
  variables
- LABEL-LESS nodes ``(n)`` (match every node table; expose ``.key`` /
  ``.label`` pseudo-properties only) and UNTYPED edges ``[r]`` (every
  relationship; ``type(r)`` / ``r.type``), enough to run the
  reference's export query verbatim:
  ``MATCH (n) OPTIONAL MATCH (n)-[r]->(m) RETURN n, type(r), m``.
  A typed edge cannot attach to an any-label variable (fails loudly)
- variable-length ``[:CALLS*min..max]`` → DISTINCT endpoint pairs with
  a shortest-connection depth in range (the engine's `reachable`
  semantics; per-PATH rows are the traverse operators' job — documented
  divergence from Cypher's one-row-per-path)
- ``WHERE`` with AND/OR/NOT, parentheses, ``=``, ``<>``, ``<``, ``<=``,
  ``>``, ``>=``, ``CONTAINS``, ``STARTS WITH``, ``ENDS WITH`` over
  ``var.prop`` against literals or ``$params``
- ``RETURN [DISTINCT] var.prop [AS alias] | var | count(*) | count(x)``
  (a bare ``var`` expands to all its properties as ``var_prop``)
- ``ORDER BY`` (aliases or var.prop, ASC/DESC), ``LIMIT n``

Label/relationship mapping (FIXTURES.md §1-2; importer.rs:143-260):

    Binary→binaries(hash) Function→functions(uid) String→strings(uid)
    Library→libraries(name)
    CONTAINS/IMPORTS: Binary→Function      CALLS: Function→Function
    IMPORTS_LIBRARY: Binary→Library        BELONGS_TO: Function→Library
    CONTAINS_STRING: Binary→String
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- schema map

NODE_LABELS: dict[str, tuple[str, str]] = {
    # label -> (table, key column)
    "Binary": ("binaries", "hash"),
    "Function": ("functions", "uid"),
    "String": ("strings", "uid"),
    "Library": ("libraries", "name"),
}

#: pseudo-label for nodes matched without a label — (n) matches every
#: node table; such variables expose `.key` / `.label` pseudo-properties
ANY = "*"

EDGE_TYPES: dict[str, tuple[str, str, str, str, str]] = {
    # type -> (table, src label, src col, dst label, dst col)
    "CONTAINS": ("contains", "Binary", "binary_hash", "Function", "function_uid"),
    "IMPORTS": ("imports", "Binary", "binary_hash", "Function", "function_uid"),
    "IMPORTS_LIBRARY": ("imports_library", "Binary", "binary_hash", "Library", "library_name"),
    "BELONGS_TO": ("belongs_to", "Function", "function_uid", "Library", "library_name"),
    "CALLS": ("calls", "Function", "src_uid", "Function", "dst_uid"),
    "CONTAINS_STRING": ("contains_string", "Binary", "binary_hash", "String", "string_uid"),
}

# ------------------------------------------------------------------ tokens

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<num>\d+(?:\.\d+)?)
      | (?P<param>\$[A-Za-z_][A-Za-z0-9_]*)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<sym><>|<=|>=|<-|->|\.\.|[()\[\]{}:,.*=<>|-])
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "ORDER", "BY", "LIMIT", "AS",
    "AND", "OR", "NOT", "DISTINCT", "CONTAINS", "STARTS", "ENDS", "WITH",
    "ASC", "DESC", "COUNT",
}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"cypher: cannot tokenize at: {text[pos:pos + 30]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(m.lastgroup)
        if kind == "word" and val.upper() in _KEYWORDS:
            out.append(("kw", val.upper()))
        else:
            out.append((kind, val))
    return out


# --------------------------------------------------------------------- AST


@dataclass
class NodePat:
    var: str  # generated name if anonymous
    label: str | None
    props: dict[str, object] = field(default_factory=dict)


@dataclass
class EdgePat:
    var: str | None
    types: list[str]
    direction: str  # '->' or '<-'
    varlen: tuple[int, int] | None = None


@dataclass
class Pattern:
    nodes: list[NodePat]
    edges: list[EdgePat]
    optional: bool = False


@dataclass
class Comparison:
    left: tuple[str, str]  # (var, prop)
    op: str
    right: object  # literal value


@dataclass
class BoolExpr:
    op: str  # 'and' | 'or' | 'not'
    args: list


@dataclass
class ReturnItem:
    kind: str  # 'prop' | 'node' | 'count_star' | 'count_var'
    var: str | None
    prop: str | None
    alias: str | None


@dataclass
class Query:
    patterns: list[Pattern]
    where: object | None
    distinct: bool
    items: list[ReturnItem]
    order: list[tuple[str, bool]]  # (alias or var.prop text, ascending)
    limit: int | None


class CypherParser:
    def __init__(self, text: str, params: dict | None = None):
        self.toks = _tokenize(text)
        self.pos = 0
        self.params = params or {}
        self._anon = 0

    # --- token helpers
    def _peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else (None, None)

    def _next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def _expect(self, kind, val=None):
        k, v = self._next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"cypher: expected {val or kind}, got {v!r}")
        return v

    def _accept(self, kind, val=None) -> bool:
        k, v = self._peek()
        if k == kind and (val is None or v == val):
            self._next()
            return True
        return False

    def _fresh(self) -> str:
        self._anon += 1
        return f"_anon{self._anon}"

    def _name(self) -> str:
        """An identifier position that may collide with a keyword —
        relationship types like CONTAINS are also WHERE operators."""
        k, v = self._next()
        if k in ("word", "kw"):
            return v
        raise ValueError(f"cypher: expected name, got {v!r}")

    # --- grammar
    def parse(self) -> Query:
        patterns = []
        while True:
            if self._accept("kw", "OPTIONAL"):
                self._expect("kw", "MATCH")
                pat = self._pattern()
                pat.optional = True
                patterns.append(pat)
            elif self._accept("kw", "MATCH"):
                patterns.append(self._pattern())
            else:
                break
        if not patterns:
            raise ValueError("cypher: query must start with MATCH")
        where = self._where() if self._accept("kw", "WHERE") else None
        self._expect("kw", "RETURN")
        distinct = self._accept("kw", "DISTINCT")
        items = [self._return_item()]
        while self._accept("sym", ","):
            items.append(self._return_item())
        order: list[tuple[str, bool]] = []
        if self._accept("kw", "ORDER"):
            self._expect("kw", "BY")
            order.append(self._order_item())
            while self._accept("sym", ","):
                order.append(self._order_item())
        limit = None
        if self._accept("kw", "LIMIT"):
            limit = int(self._expect("num"))
        k, v = self._peek()
        if k is not None:
            raise ValueError(f"cypher: trailing input at {v!r}")
        return Query(patterns, where, distinct, items, order, limit)

    def _pattern(self) -> Pattern:
        nodes = [self._node()]
        edges: list[EdgePat] = []
        while self._peek() == ("sym", "-") or self._peek() == ("sym", "<-"):
            edges.append(self._edge())
            nodes.append(self._node())
        return Pattern(nodes, edges)

    def _node(self) -> NodePat:
        self._expect("sym", "(")
        var, label = None, None
        k, v = self._peek()
        if k == "word":
            var = self._next()[1]
        if self._accept("sym", ":"):
            label = self._expect("word")
            if label not in NODE_LABELS:
                raise ValueError(f"cypher: unknown label :{label}")
        props: dict[str, object] = {}
        if self._accept("sym", "{"):
            while True:
                p = self._expect("word")
                self._expect("sym", ":")
                props[p] = self._literal()
                if not self._accept("sym", ","):
                    break
            self._expect("sym", "}")
        self._expect("sym", ")")
        return NodePat(var or self._fresh(), label, props)

    def _edge(self) -> EdgePat:
        # '<-[:T]-'  or  '-[:T]->'  (or undirected '-[:T]-' → rejected)
        back = self._accept("sym", "<-")
        if not back:
            self._expect("sym", "-")
        var, types, varlen = None, [], None
        if self._accept("sym", "["):
            k, v = self._peek()
            if k == "word":
                var = self._next()[1]
            if self._accept("sym", ":"):
                types.append(self._name())
                while self._accept("sym", "|"):
                    self._accept("sym", ":")  # Cypher allows |:T and |T
                    types.append(self._name())
            if self._accept("sym", "*"):
                lo = int(self._expect("num"))
                self._expect("sym", "..")
                hi = int(self._expect("num"))
                varlen = (lo, hi)
            self._expect("sym", "]")
        if back:
            self._expect("sym", "-")
            direction = "<-"
        else:
            if self._accept("sym", "->"):
                direction = "->"
            else:
                raise ValueError(
                    "cypher: undirected relationships are not supported (use -> or <-)"
                )
        # empty types = ANY relationship (the export-query device);
        # variable length still needs the explicit :CALLS
        for t in types:
            if t not in EDGE_TYPES:
                raise ValueError(f"cypher: unknown relationship type :{t}")
        if varlen and (len(types) != 1 or types[0] != "CALLS"):
            raise ValueError("cypher: variable length is supported for :CALLS only")
        return EdgePat(var, types, direction, varlen)

    def _literal(self):
        k, v = self._next()
        if k == "str":
            return re.sub(r"\\(.)", r"\1", v[1:-1])
        if k == "num":
            return float(v) if "." in v else int(v)
        if k == "param":
            name = v[1:]
            if name not in self.params:
                raise ValueError(f"cypher: missing parameter ${name}")
            return self.params[name]
        raise ValueError(f"cypher: expected literal, got {v!r}")

    # WHERE grammar: or_expr
    def _where(self):
        return self._or()

    def _or(self):
        left = self._and()
        while self._accept("kw", "OR"):
            left = BoolExpr("or", [left, self._and()])
        return left

    def _and(self):
        left = self._unary()
        while self._accept("kw", "AND"):
            left = BoolExpr("and", [left, self._unary()])
        return left

    def _unary(self):
        if self._accept("kw", "NOT"):
            return BoolExpr("not", [self._unary()])
        if self._accept("sym", "("):
            inner = self._or()
            self._expect("sym", ")")
            return inner
        return self._comparison()

    def _comparison(self) -> Comparison:
        var = self._expect("word")
        self._expect("sym", ".")
        prop = self._expect("word")
        k, v = self._next()
        if (k, v) == ("kw", "CONTAINS"):
            op = "contains"
        elif (k, v) == ("kw", "STARTS"):
            self._expect("kw", "WITH")
            op = "startswith"
        elif (k, v) == ("kw", "ENDS"):
            self._expect("kw", "WITH")
            op = "endswith"
        elif k == "sym" and v in ("=", "<>", "<", "<=", ">", ">="):
            op = v
        else:
            raise ValueError(f"cypher: unsupported operator {v!r}")
        return Comparison((var, prop), op, self._literal())

    def _return_item(self) -> ReturnItem:
        if self._accept("kw", "COUNT"):
            self._expect("sym", "(")
            if self._accept("sym", "*"):
                item = ReturnItem("count_star", None, None, None)
            else:
                item = ReturnItem("count_var", self._expect("word"), None, None)
            self._expect("sym", ")")
        else:
            var = self._expect("word")
            if var.lower() in ("type", "labels") and self._accept("sym", "("):
                # type(r) / labels(n) → the .type / .label pseudo-props
                inner = self._expect("word")
                self._expect("sym", ")")
                item = ReturnItem(
                    "prop", inner, "type" if var.lower() == "type" else "label", None
                )
            elif self._accept("sym", "."):
                item = ReturnItem("prop", var, self._expect("word"), None)
            else:
                item = ReturnItem("node", var, None, None)
        if self._accept("kw", "AS"):
            item.alias = self._expect("word")
        return item

    def _order_item(self) -> tuple[str, bool]:
        name = self._expect("word")
        if self._accept("sym", "."):
            name = f"{name}.{self._expect('word')}"
        asc = True
        if self._accept("kw", "DESC"):
            asc = False
        else:
            self._accept("kw", "ASC")
        return (name, asc)


# ----------------------------------------------------------------- compiler


class CypherCompiler:
    """Compile a parsed query against a dict of node/edge DataFrames
    (the `graph_tables` shape: binaries functions strings libraries
    contains imports imports_library belongs_to calls contains_string)."""

    def __init__(self, tables: dict[str, DataFrame]):
        self.tables = tables

    def compile(self, q: Query) -> DataFrame:
        bound: dict[str, str] = {}  # var -> label (ANY for label-less)
        self._edge_vars: set[str] = set()
        df: DataFrame | None = None
        for pat in q.patterns:
            if pat.optional:
                df = self._compile_optional(df, pat, bound)
            else:
                df = self._compile_pattern(df, pat, bound)
        assert df is not None
        if q.where is not None:
            df = df.filter(self._predicate(q.where, bound))
        return self._returns(df, q, bound)

    # --- helpers
    def _node_df(self, var: str, label: str) -> DataFrame:
        if label == ANY:
            # (n) with no label: every node table, identity-only columns
            frames = []
            for lbl, (table, key) in NODE_LABELS.items():
                t = self.tables[table]
                frames.append(
                    t.select(
                        F.col(key).cast("string").alias(f"{var}____key"),
                        F.lit(lbl).alias(f"{var}____label"),
                    )
                )
            out = frames[0]
            for f2 in frames[1:]:
                out = out.unionByName(f2)
            return out
        table, _key = NODE_LABELS[label]
        t = self.tables[table]
        return t.select([F.col(c).alias(f"{var}__{c}") for c in t.columns])

    def _key_col(self, var: str, label: str) -> str:
        if label == ANY:
            return f"{var}____key"
        return f"{var}__{NODE_LABELS[label][1]}"

    def _prop_col(self, var: str, prop: str, bound: dict[str, str]) -> Column:
        """Resolve var.prop to a Column — pseudo-properties for
        any-label nodes (.key/.label), labeled nodes (.key/.label as
        key column / literal), and edge variables (.type)."""
        lbl = bound.get(var)
        if lbl == ANY:
            if prop in ("key", "label"):
                return F.col(f"{var}____{prop}")
            raise ValueError(
                f"cypher: ({var}) matched without a label exposes only "
                f".key and .label, not .{prop}"
            )
        if var in self._edge_vars and prop == "type":
            return F.col(f"{var}____type")
        if lbl in NODE_LABELS and prop == "label":
            return F.lit(lbl)
        if lbl in NODE_LABELS and prop == "key":
            return F.col(self._key_col(var, lbl))
        return F.col(f"{var}__{prop}")

    def _bind_node(self, df: DataFrame | None, n: NodePat, bound: dict[str, str]) -> DataFrame:
        if n.var in bound:
            if n.label and bound[n.var] != n.label:
                raise ValueError(f"cypher: variable {n.var} re-bound to a different label")
            if df is None:
                raise ValueError("cypher: internal bind order error")
            out = df
        else:
            lbl = n.label or ANY
            nd = self._node_df(n.var, lbl)
            out = nd if df is None else df.crossJoin(nd)
            bound[n.var] = lbl
            n.label = lbl
        for p, v in n.props.items():
            out = out.filter(self._prop_col(n.var, p, bound) == F.lit(v))
        return out

    def _compile_pattern(self, df: DataFrame | None, pat: Pattern, bound: dict[str, str]) -> DataFrame:
        # infer missing labels from edge endpoints before binding
        # (untyped edges constrain nothing — endpoints stay any-label)
        for i, e in enumerate(pat.edges):
            if not e.types:
                continue
            srcs = {EDGE_TYPES[t][1] for t in e.types}
            dsts = {EDGE_TYPES[t][3] for t in e.types}
            if len(srcs) != 1 or len(dsts) != 1:
                raise ValueError("cypher: multi-type edges must share endpoint labels")
            sl, dl = srcs.pop(), dsts.pop()
            left, right = (i, i + 1) if e.direction == "->" else (i + 1, i)
            for idx, want in ((left, sl), (right, dl)):
                have = pat.nodes[idx].label or bound.get(pat.nodes[idx].var)
                if have is not None and have != want:
                    raise ValueError(
                        f"cypher: ({pat.nodes[idx].var}:{have}) cannot be the "
                        f"{'source' if want == sl else 'target'} of "
                        f":{'|'.join(e.types)} (needs :{want})"
                    )
                pat.nodes[idx].label = want

        df = self._bind_node(df, pat.nodes[0], bound)
        for i, e in enumerate(pat.edges):
            nxt = pat.nodes[i + 1]
            cur = pat.nodes[i]
            src_node, dst_node = (cur, nxt) if e.direction == "->" else (nxt, cur)
            if e.varlen:
                pairs = self._varlen_pairs(e.varlen)
            else:
                pairs = self._edge_pairs(e)
            # join the edge onto the already-bound end, then bind the far end
            src_key = lambda: F.col(self._key_col(src_node.var, src_node.label or bound[src_node.var]))  # noqa: E731
            dst_key = lambda: F.col(self._key_col(dst_node.var, dst_node.label or bound[dst_node.var]))  # noqa: E731
            if cur.var in bound and nxt.var in bound:
                df = df.join(
                    pairs,
                    (src_key() == pairs["__src"]) & (dst_key() == pairs["__dst"]),
                ).drop("__src", "__dst")
            elif e.direction == "->":
                df = df.join(pairs, src_key() == pairs["__src"]).drop("__src")
                df = self._bind_node(df, nxt, bound)
                df = df.filter(F.col("__dst") == dst_key()).drop("__dst")
            else:
                df = df.join(pairs, dst_key() == pairs["__dst"]).drop("__dst")
                df = self._bind_node(df, nxt, bound)
                df = df.filter(F.col("__src") == src_key()).drop("__src")
        return df

    def _compile_optional(
        self, df: DataFrame | None, pat: Pattern, bound: dict[str, str]
    ) -> DataFrame:
        """OPTIONAL MATCH (restricted): the pattern's FIRST node must be
        an already-bound variable and the rest must be fresh — the whole
        pattern compiles standalone and LEFT-joins on the shared
        variable's key, so unmatched rows keep NULLs in the optional
        columns (count(optVar) then counts matches, Neo4j-style).
        Divergence: the single trailing WHERE applies AFTER all matches
        (Cypher scopes a WHERE to its clause) — keep optional-side
        conditions inside the pattern's property maps."""
        first = pat.nodes[0]
        if df is None or first.var not in bound:
            raise ValueError(
                "cypher: OPTIONAL MATCH must start from an already-bound variable"
            )
        if first.label and first.label != bound[first.var]:
            raise ValueError(
                f"cypher: ({first.var}) is :{bound[first.var]}, not :{first.label}"
            )
        first.label = bound[first.var]
        for n in pat.nodes[1:]:
            if n.var in bound:
                raise ValueError(
                    "cypher: OPTIONAL MATCH may reuse only its first variable "
                    f"({n.var} is already bound)"
                )
        sub_bound: dict[str, str] = {}
        sub = self._compile_pattern(
            None, Pattern(pat.nodes, pat.edges), sub_bound
        )
        key = self._key_col(first.var, first.label)
        drop = [c for c in sub.columns if c.startswith(f"{first.var}__") and c != key]
        sub = sub.drop(*drop).withColumnRenamed(key, "__opt_key")
        out = df.join(sub, F.col(key) == F.col("__opt_key"), "left").drop("__opt_key")
        for v, lbl in sub_bound.items():
            if v != first.var:
                bound[v] = lbl
        return out

    def _edge_pairs(self, e: EdgePat) -> DataFrame:
        types = list(e.types)
        identity_only = not types
        if identity_only:
            # untyped [r]: every relationship, identity + type only
            # (keys cast to string — the any-node join key space)
            types = list(EDGE_TYPES)
        frames = []
        for t in types:
            table, _sl, sc, _dl, dc = EDGE_TYPES[t]
            ed = self.tables[table]
            if identity_only:
                cols = [
                    F.col(sc).cast("string").alias("__src"),
                    F.col(dc).cast("string").alias("__dst"),
                ]
            else:
                cols = [F.col(sc).alias("__src"), F.col(dc).alias("__dst")]
                if e.var:
                    cols += [
                        F.col(c).alias(f"{e.var}__{c}")
                        for c in ed.columns
                        if c not in (sc, dc)
                    ]
            if e.var:
                cols.append(F.lit(t).alias(f"{e.var}____type"))
                self._edge_vars.add(e.var)
            frames.append(ed.select(cols))
        out = frames[0]
        for f2 in frames[1:]:
            out = out.unionByName(f2, allowMissingColumns=True)
        # Cypher emits one row PER RELATIONSHIP: a pair present in both
        # CONTAINS and IMPORTS matches twice — no dedup here (faithful)
        return out

    def _varlen_pairs(self, varlen: tuple[int, int]) -> DataFrame:
        """DISTINCT (src, dst) pairs connected by a :CALLS path with
        length in [lo, hi] — frontier iteration with per-level distinct
        (the reachable() shape; lineage stays hi-bounded)."""
        lo, hi = varlen
        if not (1 <= lo <= hi <= 10):
            raise ValueError("cypher: *lo..hi must satisfy 1 <= lo <= hi <= 10")
        edges = self.tables["calls"].select(
            F.col("src_uid").alias("__src"), F.col("dst_uid").alias("__dst")
        ).distinct()
        level = edges
        acc = level if lo <= 1 else None
        for depth in range(2, hi + 1):
            level = (
                level.alias("l")
                .join(edges.alias("e"), F.col("l.__dst") == F.col("e.__src"))
                .select(F.col("l.__src").alias("__src"), F.col("e.__dst").alias("__dst"))
                .distinct()
            )
            if depth >= lo:
                acc = level if acc is None else acc.unionByName(level)
        assert acc is not None
        return acc.distinct()

    def _predicate(self, expr, bound: dict[str, str]) -> Column:
        if isinstance(expr, BoolExpr):
            if expr.op == "not":
                return ~self._predicate(expr.args[0], bound)
            parts = [self._predicate(a, bound) for a in expr.args]
            return parts[0] & parts[1] if expr.op == "and" else parts[0] | parts[1]
        assert isinstance(expr, Comparison)
        var, prop = expr.left
        col = self._prop_col(var, prop, bound)
        lit = F.lit(expr.right)
        return {
            "=": col == lit,
            "<>": col != lit,
            "<": col < lit,
            "<=": col <= lit,
            ">": col > lit,
            ">=": col >= lit,
            "contains": col.contains(expr.right),
            "startswith": col.startswith(expr.right),
            "endswith": col.endswith(expr.right),
        }[expr.op]

    @staticmethod
    def _apply_order(out: DataFrame, order: list[tuple[str, bool]], names: dict[str, str]) -> DataFrame:
        """Resolve ORDER BY against the RETURN surface (aliases or
        var.prop of returned items) — shared by the grouped and plain
        branches."""
        if not order:
            return out
        order_cols = []
        for name, asc in order:
            if name not in names:
                raise ValueError(
                    f"cypher: ORDER BY {name} must reference a returned "
                    f"column or alias (have: {sorted(set(names))})"
                )
            c = F.col(names[name])
            order_cols.append(c.asc() if asc else c.desc())
        return out.orderBy(*order_cols)

    def _returns(self, df: DataFrame, q: Query, bound: dict[str, str]) -> DataFrame:
        agg = [i for i in q.items if i.kind in ("count_star", "count_var")]
        if agg:
            # Cypher's implicit grouping: non-aggregate RETURN items are
            # the grouping keys (RETURN f.name, count(*) groups by name)
            keys, key_names = [], {}
            for it in q.items:
                if it.kind == "prop":
                    name = it.alias or f"{it.var}_{it.prop}"
                    keys.append(self._prop_col(it.var, it.prop, bound).alias(name))
                    key_names[f"{it.var}.{it.prop}"] = name
                    key_names[name] = name
                elif it.kind == "node":
                    raise ValueError(
                        "cypher: grouping by a whole node is unsupported — "
                        "return explicit properties next to count()"
                    )
            outs = []
            for i, it in enumerate(agg):
                name = it.alias or f"count_{i}"
                key_names[name] = name
                if it.kind == "count_star":
                    outs.append(F.count(F.lit(1)).alias(name))
                else:
                    outs.append(F.count(F.col(self._key_col(it.var, bound[it.var]))).alias(name))
            out = df.groupBy(*keys).agg(*outs) if keys else df.agg(*outs)
            out = self._apply_order(out, q.order, key_names)
        else:
            cols = []
            out_names: dict[str, str] = {}  # 'var.prop' / alias -> output col
            for it in q.items:
                if it.kind == "prop":
                    name = it.alias or f"{it.var}_{it.prop}"
                    cols.append(self._prop_col(it.var, it.prop, bound).alias(name))
                    out_names[f"{it.var}.{it.prop}"] = name
                    out_names[name] = name
                else:  # whole node → expand properties as var_prop
                    label = bound[it.var]
                    if label == ANY:
                        # label-less nodes expand to identity columns
                        for c in ("key", "label"):
                            cols.append(F.col(f"{it.var}____{c}").alias(f"{it.var}_{c}"))
                            out_names[f"{it.var}.{c}"] = f"{it.var}_{c}"
                            out_names[f"{it.var}_{c}"] = f"{it.var}_{c}"
                        continue
                    table, _k = NODE_LABELS[label]
                    for c in self.tables[table].columns:
                        cols.append(F.col(f"{it.var}__{c}").alias(f"{it.var}_{c}"))
                        out_names[f"{it.var}.{c}"] = f"{it.var}_{c}"
                        out_names[f"{it.var}_{c}"] = f"{it.var}_{c}"
            out = df.select(cols)
            if q.distinct:
                out = out.distinct()
            out = self._apply_order(out, q.order, out_names)
        if q.limit is not None:
            out = out.limit(q.limit)
        return out


def cypher(tables: dict[str, DataFrame], text: str, params: dict | None = None) -> DataFrame:
    """Parse + compile a Cypher-subset query over the graph tables."""
    return CypherCompiler(tables).compile(CypherParser(text, params).parse())
