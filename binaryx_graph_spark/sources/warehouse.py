"""Parquet warehouse (reference S4-S6: schema init, export, clear —
/root/reference/src/neo4j/schema.rs:13-76, src/api/client.rs:97-105,
src/neo4j/connection.rs:169-174).

Layout: one parquet dataset per node/edge table under a root directory.
Unique constraints (schema.rs:20-29) are dedup invariants enforced by
:func:`merge_batch`; b-tree indexes are unnecessary (Catalyst pushdown);
the Lucene fulltext index becomes a derived posting table
(operators/search.py).

Commit protocol (ONE, for every table): Delta/Iceberg-lite MANIFESTS.
Data files are IMMUTABLE once written; each commit writes its output as
NEW files and publishes a manifest
(``<root>/_manifests/<table>/vNNNNN.json``) whose single atomic
create-if-absent IS the commit.  No live data file is ever renamed,
rewritten, or deleted by a commit, so the protocol is object-store-safe
(on S3 the manifest publish maps to one conditional PUT of a small
object; orphaned data files from a crashed or conflicted commit are
invisible to readers and swept by :meth:`vacuum`).  Two table layouts
share the protocol:

* **Flat tables** (:meth:`merge_batch`) — the manifest lists the
  table's files at the table root (``{"files": [...]}``); every commit
  is a whole-table rewrite.
* **Bucketed tables** (:meth:`merge_batch_incremental`) — the manifest
  is the bucket→file-list map plus the PINNED bucket count
  (``{"n_buckets": B, "buckets": {...}}``); a commit rewrites only the
  key-buckets the batch touches, so old and new versions SHARE
  untouched buckets' files and every commit is a time-travelable
  version at zero extra bytes.

Reads resolve through the newest manifest; ``read(table, version=N)``
resolves through manifest ``N``; :meth:`rollback` is a pure metadata
commit whenever the target version's layout matches the live one (a new
manifest that repeats an old file list); :meth:`vacuum` deletes exactly
the files unreachable from the retained manifests.

**Concurrent writers** are serialized optimistically (the Delta/Iceberg
commit loop): the manifest is published with an atomic
create-if-absent, so of two writers racing on version N exactly one
wins; the loser re-reads the new head and either REBASES (a bucketed
incremental commit whose touched buckets are disjoint from every
intervening commit's — its bucket rewrites are re-applied onto the new
head's map) or raises :class:`ConcurrentCommitError` (overlapping
buckets, or a whole-table commit — conversion, rollback, rebucket,
compaction, flat merge — racing anything).

Version numbers are one monotone sequence per table: pre-manifest
directory states are adopted as version 0 on first commit, a flat→
bucketed conversion is just the next commit (the flat state stays
readable through its own manifest), and :meth:`rebucket` re-layouts to
a new bucket modulus as a commit old versions time-travel across.
Directory snapshots under ``<root>/_versions`` from the pre-manifest
protocol remain readable and vacuumable but are never created anymore.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..model import EDGE_TABLES, NODE_TABLES

#: the MODEL STORE table: trained artifacts (IVF/PQ codebooks, …) as
#: rows of a keyed warehouse table — so models share the manifest
#: protocol's whole story (LWW commit, time travel, concurrency,
#: vacuum) instead of living as driver-local tempfiles.  `content_key`
#: is the training-code-versioned content address (a stale artifact
#: misses and retrains); `payload` is the JSON artifact (dimension-
#: sized — a codebook is k·dim floats, a row, not a table).
_MODELS_SCHEMA = None  # materialized below (needs pyspark.sql.types)


def _models_schema():
    from pyspark.sql.types import StringType, StructField, StructType

    return StructType(
        [
            StructField("name", StringType(), False),
            StructField("kind", StringType(), True),
            StructField("content_key", StringType(), True),
            StructField("payload", StringType(), True),
        ]
    )


def _vectors_schema():
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
            StructField("label", IntegerType(), True),
        ]
    )


def _ivf_assignments_schema():
    """The persisted IVF index: one assignment row per (corpus,
    vector) — centroid_id for probe pruning, the vector denormalized
    for scoring (the inverted-list layout, as a KEYED warehouse table
    so DML maintenance composes: LWW re-assign on update, DV-delete on
    tombstone, cluster-by-centroid compaction for scan pruning)."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("corpus", StringType(), False),
            StructField("vec_id", LongType(), False),
            StructField("centroid_id", IntegerType(), True),
            StructField("embedding", ArrayType(FloatType()), True),
        ]
    )


ALL_TABLES = {
    **NODE_TABLES,
    **EDGE_TABLES,
    "_models": (_models_schema(), ["name"]),
    "vectors": (_vectors_schema(), ["vec_id"]),
    "_ivf_assignments": (_ivf_assignments_schema(), ["corpus", "vec_id"]),
}

#: MERGE key per table (FIXTURES.md §2). Tables whose key is the full row
#: use plain dropDuplicates; keyed tables are last-write-wins.
MERGE_KEYS = {
    "binaries": ["hash"],
    "functions": ["uid"],
    "strings": ["uid"],
    "libraries": ["name"],
    "contains": ["binary_hash", "function_uid"],
    "imports": ["binary_hash", "function_uid"],
    "imports_library": ["binary_hash", "library_name"],
    "belongs_to": ["function_uid", "library_name"],
    "calls": ["src_uid", "dst_uid"],
    "contains_string": ["binary_hash", "string_uid", "address"],
    "_models": ["name"],
    "vectors": ["vec_id"],
    "_ivf_assignments": ["corpus", "vec_id"],
}


#: Zone-map guard: keep a string min/max only when shorter than this.
#: parquet-java's statistics truncation lengths are >= 64, so any full
#: value under this bound is exact — a truncated UPPER bound would be a
#: PREFIX of the true max (lexicographically smaller), which could prune
#: a file that matches; dropping long-string stats keeps pruning safe.
_STATS_MAX_STRLEN = 64


def _assignable_type(rhs, stored) -> bool:
    """Whether an assignment's resolved type may be written into a
    stored column WITHOUT a lossy/ANSI-off-silent cast: same type,
    explicit NULL, or lossless numeric widening only.  Shared by
    :meth:`Warehouse.update_where` and :meth:`Warehouse.merge_into` so
    the two DML paths agree — with ANSI off, a mistyped assignment
    (``{"size": "abc"}`` on a long column) would otherwise silently
    write NULL into every matched row."""
    from pyspark.sql.types import (
        FractionalType,
        IntegralType,
        NullType,
        NumericType,
    )

    if isinstance(rhs, NullType) or rhs == stored:
        return True
    if isinstance(stored, FractionalType) and isinstance(rhs, NumericType):
        return True  # int/float → double: lossless widen
    if isinstance(stored, IntegralType) and isinstance(rhs, IntegralType):
        return True  # int-family literal → stored int width
    return False


def _parquet_minmax(path) -> dict[str, list]:
    """Per-column ``[min, max]`` zone map from a parquet file's FOOTER —
    metadata only, no data pages read (the object-store analog is one
    ranged GET of the footer, which the writer that just wrote the file
    has in memory anyway).  Only lossless-in-JSON scalar types are kept
    (int/float/string/bool); a column missing statistics in ANY row
    group is dropped for the whole file.  Missing stats are always safe:
    readers treat a file without a column's zone map as unprunable."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(str(path)).metadata
    if meta.num_row_groups == 0 or meta.num_rows == 0:
        return {}
    acc: dict[str, list] = {}
    dead: set[str] = set()
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name or name in dead:  # nested leaf / already dropped
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                dead.add(name)
                continue
            mn, mx = st.min, st.max
            ok = False
            if isinstance(mn, bool) and isinstance(mx, bool):
                ok = True
            elif isinstance(mn, int) and isinstance(mx, int):
                ok = True
            elif isinstance(mn, float) and isinstance(mx, float):
                # Floating-point columns are UNPRUNABLE: parquet writers
                # exclude NaN from min/max, but Spark orders NaN above
                # every value and NaN = NaN is true, so a file whose only
                # matching rows are NaN (col > 0, col = NaN) would be
                # pruned by its NaN-blind stats.  Iceberg solves this
                # with per-file nan_counts; pyarrow's footer statistics
                # don't expose one, so we drop float stats entirely —
                # missing stats are always safe (file stays scanned).
                ok = False
            elif isinstance(mn, str) and isinstance(mx, str):
                ok = (
                    len(mn) < _STATS_MAX_STRLEN and len(mx) < _STATS_MAX_STRLEN
                )
            if not ok:
                dead.add(name)
                continue
            if name in acc:
                acc[name][0] = min(acc[name][0], mn)
                acc[name][1] = max(acc[name][1], mx)
            else:
                acc[name] = [mn, mx]
    for name in dead:
        acc.pop(name, None)
    return acc


#: Bloom sizing: target false-positive rate and a hard cap on bits per
#: file per column (128 KB) so a sidecar stays one small object.
_BLOOM_FPP = 0.01
_BLOOM_MAX_BITS = 1 << 20


def _bloom_params(n_rows: int) -> tuple[int, int]:
    """(m_bits, k) for ``n_rows`` values at the target fpp — the
    textbook m = -n·ln(p)/ln2², k = (m/n)·ln2, m rounded to a power of
    two (cheap modulo) and capped."""
    import math

    n = max(1, n_rows)
    m = int(-n * math.log(_BLOOM_FPP) / (math.log(2) ** 2))
    mb = 1 << max(10, (m - 1).bit_length())
    mb = min(mb, _BLOOM_MAX_BITS)
    k = max(1, min(16, round(mb / n * math.log(2))))
    return mb, k


def _bloom_key_bytes(value) -> bytes | None:
    """Deterministic byte serialization for bloom membership — ints and
    strings only (float equality is a smell; other types unsupported).
    MUST be identical at build and probe time."""
    if isinstance(value, bool) or value is None:
        return None
    if isinstance(value, int):
        return str(value).encode()
    if isinstance(value, str):
        return value.encode("utf-8")
    return None


def _bloom_positions(data: bytes, m_bits: int, k: int) -> list[int]:
    """k double-hashed bit positions (Kirsch–Mitzenmacher over one
    blake2b digest split into two 64-bit halves)."""
    import hashlib

    d = hashlib.blake2b(data, digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % m_bits for i in range(k)]


def _build_file_bloom(path, cols: list[str]) -> dict[str, dict]:
    """Per-column bloom filter over one parquet file's values — built by
    the committing writer, which just wrote the file (the object-store
    analog computes this inside the write task; a post-pass column read
    is the honest local stand-in).  Returns
    {col: {'m': bits, 'k': k, 'b64': base64(bitset)}}."""
    import base64

    import pyarrow.parquet as pq

    pf = pq.ParquetFile(str(path))
    want = [c for c in cols if c in pf.schema_arrow.names]
    if not want:
        return {}
    mb, k = _bloom_params(pf.metadata.num_rows)
    out: dict[str, dict] = {}
    table = pf.read(columns=want)
    for c in want:
        bits = bytearray(mb // 8)
        ok = True
        for v in table.column(c).to_pylist():
            if v is None:
                continue
            data = _bloom_key_bytes(v)
            if data is None:
                ok = False  # unsupported type: no bloom for this column
                break
            for pos in _bloom_positions(data, mb, k):
                bits[pos >> 3] |= 1 << (pos & 7)
        if ok:
            out[c] = {"m": mb, "k": k, "b64": base64.b64encode(bytes(bits)).decode()}
    return out


def _bloom_may_contain(bloom: dict, value) -> bool:
    """Probe one column's bloom — True unless DEFINITELY absent."""
    import base64

    data = _bloom_key_bytes(value)
    if data is None:
        return True
    bits = base64.b64decode(bloom["b64"])
    for pos in _bloom_positions(data, bloom["m"], bloom["k"]):
        if not (bits[pos >> 3] & (1 << (pos & 7))):
            return False
    return True


def _same_type_class(a, b) -> bool:
    """Pruning is only sound when the predicate value and the stored
    stats compare the way SPARK would compare them.  A cross-type
    predicate (int against a string column, ...) goes through Spark's
    implicit casts — e.g. ``uid = '00777'`` matches int 777 — which
    byte-level stats and bloom hashes know nothing about.  Same
    type-class ⇒ prune; anything else ⇒ unprunable, Spark decides."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool)
    if isinstance(a, str) or isinstance(b, str):
        return isinstance(a, str) and isinstance(b, str)
    num = (int, float)
    return isinstance(a, num) and isinstance(b, num)


def _zone_overlaps(stat: list, op: str, value) -> bool:
    """May rows in a file with zone map ``stat=[min,max]`` satisfy
    ``col <op> value``?  Conservative: True unless the whole range
    provably misses.  NULLs never satisfy a comparison, so min/max of
    the non-null values is the only range that matters."""
    mn, mx = stat
    probe = value[0] if op in ("between", "in") and len(value) else value
    if not _same_type_class(mn, probe) or (
        op in ("between", "in") and not all(_same_type_class(mn, v) for v in value)
    ):
        return True  # cross-type predicate: Spark's cast decides, not us
    if op == "=":
        return mn <= value <= mx
    if op == "<":
        return mn < value
    if op == "<=":
        return mn <= value
    if op == ">":
        return mx > value
    if op == ">=":
        return mx >= value
    if op == "between":
        lo, hi = value
        return not (mx < lo or mn > hi)
    if op == "in":
        return any(mn <= v <= mx for v in value)
    raise ValueError(f"unknown scan predicate op {op!r}")


class IdempotentReplay(Exception):
    """Internal control flow: a commit carrying ``txn=(app, version)``
    found the table's manifest already records ``app`` at an equal or
    higher version — the batch was committed before (a streaming replay
    after a checkpoint loss, a scheduler retry of an acked job).  The
    merge methods catch this and SKIP the table: zero files written,
    zero versions published."""


class ConcurrentCommitError(RuntimeError):
    """Two writers committed to one table and their changes overlap (or
    one of them rewrites the whole table): the loser's commit cannot be
    rebased and must be retried against the new head. Its already-
    written data files are orphans — invisible to readers, reclaimed by
    :meth:`Warehouse.vacuum`."""


class Warehouse:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        bloom_columns: dict[str, list[str]] | None = None,
    ):
        """``bloom_columns`` ({table: [col, ...]}) opts columns into
        PER-FILE BLOOM FILTERS: every commit builds a bloom over each
        new file's values for those columns (sidecar JSON under
        ``_blooms/<table>/``, referenced — not embedded — by the
        manifest, so manifests stay small), and :meth:`scan` probes
        them for ``=`` / ``in`` predicates — the high-cardinality
        equality case zone maps can't prune (a uniformly distributed id
        overlaps every file's min/max range but is definitely-absent
        from most blooms).  Advisory like zone maps: false positives
        cost an extra file read, false negatives are impossible
        (predicates re-apply exactly)."""
        self.spark = spark
        self.root = Path(root)
        self.bloom_columns = bloom_columns or {}

    def _path(self, table: str) -> str:
        return str(self.root / table)

    def _key_bucket(self, table: str, n_buckets: int):
        keys = MERGE_KEYS[table]
        return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast(
            "int"
        )

    # ------------------------------------------------------------- S6 init
    def initialize(self) -> None:
        """Create empty typed tables (the reference's schema init)."""
        self.root.mkdir(parents=True, exist_ok=True)
        for name, (schema, _key) in ALL_TABLES.items():
            if not (self.root / name).exists():
                empty = self.spark.createDataFrame([], schema)
                empty.write.mode("overwrite").parquet(self._path(name))

    # ------------------------------------------------------------- S5 clear
    def clear(self) -> None:
        """DETACH DELETE everything → drop and recreate empty tables."""
        if self.root.exists():
            shutil.rmtree(self.root)
        self.initialize()

    def version_at(self, table: str, timestamp: float) -> int:
        """TIMESTAMP AS OF resolution (Delta's): the newest committed
        version whose publish time is <= ``timestamp`` (epoch seconds).
        Raises when the timestamp predates the first commit — asking
        for a state that never existed must not silently read
        something else.  Pre-timestamp manifests (older rounds) count
        as epoch 0, i.e. always included."""
        mvs = self._manifest_versions(table)
        best = None
        for v in mvs:
            if self._manifest(table, v).get("committed_at", 0.0) <= timestamp:
                best = v
        if best is None:
            raise FileNotFoundError(
                f"warehouse table '{table}' has no version at or before "
                f"timestamp {timestamp} (first commit is later)"
            )
        return best

    def read(
        self,
        table: str,
        version: int | None = None,
        *,
        timestamp: float | None = None,
    ) -> DataFrame:
        """Read a table — the live state, a committed version by number
        (see :meth:`versions`), or TIMESTAMP AS OF (epoch seconds —
        resolved to the newest version published at or before it).
        Manifested tables resolve through their manifest; the internal
        ``_kb`` partition column is never part of the logical schema,
        live or versioned."""
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp, not both")
            version = self.version_at(table, timestamp)
        mvs = self._manifest_versions(table)
        if version is not None:
            if version in mvs:
                m = self._manifest(table, version)
                df = self._read_manifest(table, version)
                # THAT version's column mapping: time travel across a
                # rename shows the old logical names
                return self._to_logical(df.drop("_kb"), m)
            vp = self._version_dir(table) / f"v{version:05d}"
            if vp.exists():
                df = self.spark.read.parquet(str(vp))
                return df.drop("_kb")
            # a never-merged table has no manifest; history() shows its
            # live directory as the next version number — accept it
            live_v = (self.versions(table) or [-1])[-1] + 1
            if not mvs and version == live_v and (self.root / table).exists():
                return self.spark.read.parquet(self._path(table)).drop("_kb")
            raise FileNotFoundError(
                f"warehouse table '{table}' has no version {version} "
                f"(available: {self.versions(table)})"
            )
        if mvs:
            return self._to_logical(
                self._read_manifest(table, mvs[-1]).drop("_kb"),
                self._manifest(table, mvs[-1]),
            )
        if not (self.root / table).exists():
            raise FileNotFoundError(
                f"warehouse table '{table}' not found under {self.root} — "
                f"run `import` (or `db init`) against this warehouse first"
            )
        df = self.spark.read.parquet(self._path(table))
        # pre-manifest bucketed dirs (legacy layout) still carry _kb
        return df.drop("_kb")

    @staticmethod
    def _apply_predicates(df: DataFrame, predicates) -> DataFrame:
        """Apply scan conjuncts exactly (Spark-side) — zone-map pruning
        is advisory, this is the correctness layer."""
        for col, op, val in predicates:
            c = F.col(col)
            if op == "=":
                df = df.filter(c == val)
            elif op == "<":
                df = df.filter(c < val)
            elif op == "<=":
                df = df.filter(c <= val)
            elif op == ">":
                df = df.filter(c > val)
            elif op == ">=":
                df = df.filter(c >= val)
            elif op == "between":
                df = df.filter((c >= val[0]) & (c <= val[1]))
            elif op == "in":
                df = df.filter(c.isin(list(val)))
            else:
                raise ValueError(f"unknown scan predicate op {op!r}")
        return df

    def scan(
        self,
        table: str,
        predicates=(),
        version: int | None = None,
        *,
        with_diagnostics: bool = False,
    ):
        """DATA-SKIPPING read: resolve the manifest, prune its file list
        with the per-file zone maps (``stats`` — min/max per column,
        recorded at commit from parquet footers), then read ONLY the
        surviving files and re-apply the predicates exactly.  The result
        always equals ``read(table, version).filter(...)``; pruning only
        changes how many files are opened — at 100 TB, a range predicate
        on a clustered column (see :meth:`optimize` ``cluster_by``)
        skips the bulk of the table without a single data-page read,
        and the decision is pure manifest metadata (no LIST, no footer
        GETs at read time).

        ``predicates`` is a conjunction of ``(col, op, value)`` with op
        in ``{'=', '<', '<=', '>', '>=', 'between', 'in'}``
        (``between`` takes ``(lo, hi)``, ``in`` a value list).  A file
        with no zone map for a referenced column is kept (missing stats
        are unprunable, never wrong).  On a BUCKETED table whose merge
        key is fully pinned by equality predicates, the key's bucket is
        computed first and every other bucket's files drop without even
        consulting their stats — the point-lookup path: O(1) buckets of
        a 100 TB table.

        With ``with_diagnostics=True`` returns ``(df, diag)`` where
        ``diag = {'files_total': n, 'files_read': m}`` — the certifier's
        hook for asserting pruning actually happened."""
        preds = list(predicates)
        mvs = self._manifest_versions(table)
        v = version if version is not None else (mvs[-1] if mvs else None)
        if v is None or v not in mvs:
            # pre-manifest table / legacy snapshot: no zone maps — exact
            # result via a full read, diagnostics report no pruning
            df = self._apply_predicates(self.read(table, version=version), preds)
            if with_diagnostics:
                return df, {"files_total": None, "files_read": None}
            return df
        m = self._manifest(table, v)
        # predicates arrive over LOGICAL names; the skipping stack
        # (zone maps, blooms, bucket hash) speaks physical
        preds = self._preds_physical(preds, m)
        keep_rels, total = self._prune_rels(table, m, preds)
        keep = [str(p) for _rel, p in keep_rels]
        base = self.root / table
        bucketed = "buckets" in m
        if not keep:
            schema = self._schema_of(m)
            if schema is not None:
                empty = self.spark.createDataFrame([], schema)
            elif table in ALL_TABLES:
                empty = self.spark.createDataFrame([], ALL_TABLES[table][0])
            else:
                empty = self._read_manifest(table, v).limit(0).drop("_kb")
            empty = self._to_logical(empty, m)
            return (empty, {"files_total": total, "files_read": 0}) if with_diagnostics else empty
        df = self._read_files_dv(
            table, m, [(rel, str(p)) for rel, p in keep_rels]
        ).drop("_kb")
        df = self._to_logical(self._apply_predicates(df, preds), m)
        if with_diagnostics:
            return df, {"files_total": total, "files_read": len(keep)}
        return df

    def _prune_rels(
        self, table: str, m: dict, preds: list
    ) -> tuple[list[tuple[str, Path]], int]:
        """The skipping core shared by :meth:`scan` and
        :meth:`delete_where`: from a manifest's file list, keep only
        files that MAY contain rows matching the predicate conjunction
        — via key-bucket hashing (fully pinned merge key), zone maps,
        and bloom sidecars, each guarded against cross-type predicates.
        Returns (kept (rel, path) pairs, total files listed)."""
        stats = m.get("stats", {})
        base = self.root / table
        bucketed = "buckets" in m
        if bucketed:
            rels = [
                (f"{b}/{fn}", base / f"_kb={b}" / fn)
                for b, fs in m["buckets"].items()
                for fn in fs
            ]
        else:
            rels = [(fn, base / fn) for fn in m["files"]]
        total = len(rels)
        keys = MERGE_KEYS.get(table)
        eq = {c: val for c, op, val in preds if op == "="}
        if bucketed and keys and m.get("n_buckets") and all(k in eq for k in keys):
            # point lookup: one 1-row job hashes the pinned key to its
            # bucket; all other buckets drop by construction.  ONLY
            # sound when every value's type matches its key column's
            # type — xxhash64(int 777) lands in a different bucket than
            # xxhash64('777'), and Spark's implicit cast would still
            # match the row (same guard as _same_type_class)
            schema = self._schema_of(m)
            if schema is None and table in ALL_TABLES:
                schema = ALL_TABLES[table][0]
            fields = {f.name: f.dataType for f in schema.fields} if schema else {}

            def _key_typed(k) -> bool:
                # xxhash64 is TYPE-sensitive: the probe literal must
                # hash exactly as the stored column does, so the guard
                # demands the same type class (float-vs-integral
                # rejected — F.lit(5) hashed as Integer/Double lands in
                # a different bucket than the stored Long) and the
                # probe below casts to the column's exact dataType.
                from pyspark.sql.types import (
                    BooleanType,
                    FractionalType,
                    IntegralType,
                    StringType,
                )

                dt, v = fields.get(k), eq[k]
                if isinstance(dt, StringType):
                    return isinstance(v, str)
                if isinstance(dt, BooleanType):
                    return isinstance(v, bool)
                if isinstance(v, bool):
                    return False
                if isinstance(dt, IntegralType):
                    return isinstance(v, int)
                if isinstance(dt, FractionalType):
                    # int literal casts exactly into float/double; a
                    # float literal against an integral column does NOT
                    return isinstance(v, (int, float))
                return False

            if all(_key_typed(k) for k in keys):
                row = (
                    self.spark.range(1)
                    .select(
                        *[F.lit(eq[k]).cast(fields[k]).alias(k) for k in keys]
                    )
                    .select(self._key_bucket(table, m["n_buckets"]).alias("b"))
                    .collect()[0]
                )
                tb = f"{row['b']}/"
                rels = [(r, p) for r, p in rels if r.startswith(tb)]
        blooms = m.get("blooms", {})
        eq_probes = [
            (c, [val] if op == "=" else list(val))
            for c, op, val in preds
            if op in ("=", "in")
        ]
        _bloom_cache: dict[str, dict] = {}

        def _bloom_dead(rel: str) -> bool:
            """True if some equality predicate's every candidate value
            is DEFINITELY absent from this file's bloom (sidecar loaded
            lazily — only for files that survived zone pruning)."""
            sc = blooms.get(rel)
            if sc is None or not eq_probes:
                return False
            if sc not in _bloom_cache:
                p = self.root / "_blooms" / table / sc
                try:
                    _bloom_cache[sc] = json.loads(p.read_text())
                except OSError:
                    _bloom_cache[sc] = {}
            bl = _bloom_cache[sc]
            st = stats.get(rel) or {}

            def _typed(c, vals):
                # bloom pruning needs the same type-class guard as zone
                # maps: Spark's implicit cast can match values whose
                # bytes the bloom never saw (see _same_type_class); the
                # column's zone-map min anchors the stored type
                return c in st and all(_same_type_class(st[c][0], v) for v in vals)

            return any(
                c in bl
                and _typed(c, vals)
                and not any(_bloom_may_contain(bl[c], v) for v in vals)
                for c, vals in eq_probes
            )

        keep: list[tuple[str, Path]] = []
        for rel, p in rels:
            st = stats.get(rel)
            if st:
                dead = any(
                    col in st and not _zone_overlaps(st[col], op, val)
                    for col, op, val in preds
                )
                if dead:
                    continue
            if _bloom_dead(rel):
                continue
            keep.append((rel, p))
        return keep, total

    def delete_where(
        self,
        table: str,
        predicates,
        *,
        txn: tuple[str, int] | None = None,
    ) -> dict:
        """Row-level DELETE of every row matching ALL ``predicates``
        (same conjunct grammar as :meth:`scan`) — Delta's DELETE on
        this manifest.  FILE-GRANULAR: the skipping stack
        (:meth:`_prune_rels` — bucket hash, zone maps, blooms) picks
        the files that MAY contain matches; only those are read and
        rewritten without their matching rows, every other file is
        carried untouched, and ONE manifest commit publishes the
        result — so deleting a clustered range, a point key, or a
        bloom-indexed value from a 100 TB table rewrites O(matching
        files), not the table.  The pre-delete version stays
        time-travelable; :meth:`read_changes` reports exactly the
        deleted rows.

        NULL semantics are SQL's: a row whose predicate evaluates to
        NULL does not match and is KEPT (delete uses
        ``coalesce(pred, false)``, the complement re-applies exactly).

        On a bucketed table the commit declares the affected buckets as
        ``touched``, so it rebases over concurrent disjoint commits
        like any incremental merge.  ``txn`` gives the same
        exactly-once replay contract as :meth:`merge_batch`.

        Returns ``{'files_total', 'files_rewritten', 'rows_deleted'}``
        (rows_deleted counted before the rewrite; a candidate file with
        zero actual matches is still rewritten — the row content is
        identical, only layout changes)."""
        preds = list(predicates)
        if not preds:
            raise ValueError(
                "delete_where with no predicates would delete the whole "
                "table — use clear() for that, explicitly"
            )
        if txn is not None:
            seen = self.last_txn_version(table, txn[0])
            if seen is not None and seen >= txn[1]:
                return {"files_total": 0, "files_rewritten": 0, "rows_deleted": 0}
        mvs = self._manifest_versions(table)
        if not mvs:  # adopt the live directory so delete is a commit
            if any((self.root / table).glob("_kb=*")):
                dirb = self._dir_buckets(table)
                self._validate_bucket_modulus(table, dirb, self.N_KEY_BUCKETS)
                self._commit_manifest(table, dirb, self.N_KEY_BUCKETS)
            else:
                self._adopt_flat(table)
            mvs = self._manifest_versions(table)
        m = self._manifest(table, mvs[-1])
        preds = self._preds_physical(preds, m)  # column mapping: renames
        cand, total = self._prune_rels(table, m, preds)
        if not cand:
            return {"files_total": total, "files_rewritten": 0, "rows_deleted": 0}
        bucketed = "buckets" in m
        # DV-aware candidate read: rows already tombstoned by a prior
        # merge-on-read delete must neither match nor resurrect in the
        # rewrite (the rewritten file drops its DV list — purge)
        df = self._read_files_dv(table, m, [(rel, str(p)) for rel, p in cand])
        match_expr = self._predicate_expr(preds)
        n_deleted = df.filter(match_expr).count()
        if n_deleted == 0:
            # candidates were only MAYBE-matching (zone/bloom bounds);
            # zero actual matches → no rewrite, no version — replaying
            # an already-applied purge is metadata-free
            return {"files_total": total, "files_rewritten": 0, "rows_deleted": 0}
        kept = df.filter(~F.coalesce(match_expr, F.lit(False)))
        cand_rels = {rel for rel, _p in cand}
        try:
            if bucketed:
                staged, fb = self._stage_bucketed(table, kept)
                new_buckets = {}
                touched: set[str] = set()
                for b, fns in m["buckets"].items():
                    survivors = [
                        fn for fn in fns if f"{b}/{fn}" not in cand_rels
                    ]
                    fresh = staged.get(b, [])
                    if len(survivors) != len(fns) or fresh:
                        touched.add(b)
                    new_buckets[b] = survivors + fresh
                self._commit_manifest(
                    table,
                    new_buckets,
                    m["n_buckets"],
                    base_version=m["version"],
                    touched=touched,
                    file_bytes=fb,
                    txn=txn,
                )
            else:
                staged_names, fb = self._stage_flat(table, kept, key_shuffle=False)
                survivors = [fn for fn in m["files"] if fn not in cand_rels]
                self._commit_manifest(
                    table,
                    files=survivors + staged_names,
                    base_version=m["version"],
                    file_bytes=fb,
                    txn=txn,
                )
        except IdempotentReplay:
            return {"files_total": total, "files_rewritten": 0, "rows_deleted": 0}
        return {
            "files_total": total,
            "files_rewritten": len(cand),
            "rows_deleted": int(n_deleted),
        }

    def delete_where_dv(
        self,
        table: str,
        predicates,
        *,
        txn: tuple[str, int] | None = None,
    ) -> dict:
        """MERGE-ON-READ row-level DELETE: instead of rewriting every
        candidate file without its matching rows (:meth:`delete_where`
        — O(file) write-amp per trickle delete), record the matching
        rows' POSITIONS in a deletion-vector sidecar and publish a
        manifest that references it — the commit writes O(deleted
        rows), not O(touched files).  This is Delta/Iceberg's DV
        design: a parquet file's physical row order is immutable, so
        ``(file, row_index)`` is a durable row identity.

        Mechanics: the skipping stack picks candidate files; they are
        read WITH ``_metadata.row_index``, already-tombstoned positions
        are excluded (stacked deletes never double-count), the fresh
        tombstones are written as ONE parquet sidecar under
        ``_dvs/<table>/``, and the manifest commit appends the sidecar
        to each affected file's DV list — data files untouched, zone
        maps/blooms untouched (they over-approximate, which only keeps
        pruning safe).  Readers (:meth:`read`, :meth:`scan`, time
        travel, :meth:`read_changes`, the CDF stream, incremental
        merges) apply DVs via an anti-join on the tombstone positions;
        :meth:`optimize` is the purge point — a compacted bucket
        rewrites its survivors and drops the DV references.

        On a bucketed table the commit declares the affected buckets
        ``touched`` (rebases over disjoint concurrent commits); flat
        tables commit whole-table like every flat commit.  ``txn``
        gives the exactly-once replay contract.

        Returns ``{'files_total', 'files_rewritten': 0, 'rows_deleted',
        'dv_bytes'}`` — ``dv_bytes`` is the size of the sidecar this
        commit wrote (the measured write-amp, asserted by the gate
        certifier against the rewrite path's file sizes)."""
        preds = list(predicates)
        if not preds:
            raise ValueError(
                "delete_where_dv with no predicates would delete the whole "
                "table — use clear() for that, explicitly"
            )
        if txn is not None:
            seen = self.last_txn_version(table, txn[0])
            if seen is not None and seen >= txn[1]:
                return {
                    "files_total": 0, "files_rewritten": 0,
                    "rows_deleted": 0, "dv_bytes": 0,
                }
        mvs = self._manifest_versions(table)
        if not mvs:  # adopt the live directory so delete is a commit
            if any((self.root / table).glob("_kb=*")):
                dirb = self._dir_buckets(table)
                self._validate_bucket_modulus(table, dirb, self.N_KEY_BUCKETS)
                self._commit_manifest(table, dirb, self.N_KEY_BUCKETS)
            else:
                self._adopt_flat(table)
            mvs = self._manifest_versions(table)
        m = self._manifest(table, mvs[-1])
        preds = self._preds_physical(preds, m)  # column mapping: renames
        cand, total = self._prune_rels(table, m, preds)
        if not cand:
            return {
                "files_total": total, "files_rewritten": 0,
                "rows_deleted": 0, "dv_bytes": 0,
            }
        base = self.root / table
        bucketed = "buckets" in m
        schema = self._schema_of(m)
        rdr = self.spark.read if schema is None else self.spark.read.schema(schema)
        files = [str(p) for _rel, p in cand]
        if bucketed:
            raw = rdr.option("basePath", str(base)).parquet(*files)
            pat = r"_kb=(\d+)/([^/]+)$"
            fp = F.col("_metadata.file_path")
            rel_expr = F.concat(
                F.regexp_extract(fp, pat, 1),
                F.lit("/"),
                F.regexp_extract(fp, pat, 2),
            )
        else:
            raw = rdr.parquet(*files)
            rel_expr = F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            )
        match_expr = F.coalesce(self._predicate_expr(preds), F.lit(False))
        matches = raw.filter(match_expr).select(
            rel_expr.alias("rel"),
            F.col("_metadata.row_index").alias("pos"),
        )
        dvs = m.get("dvs", {})
        cand_dv_names = sorted(
            {n for rel, _p in cand for n in dvs.get(rel, [])}
        )
        if cand_dv_names:  # stacked deletes: skip already-dead positions
            prior = self.spark.read.schema("rel string, pos long").parquet(
                *[str(self._dv_dir(table) / n) for n in cand_dv_names]
            )
            matches = matches.join(prior, ["rel", "pos"], "left_anti")
        # one shuffle-free sidecar: positions are tiny relative to data
        matches = matches.coalesce(1).localCheckpoint(eager=True)
        n_deleted = matches.count()
        if n_deleted == 0:
            return {
                "files_total": total, "files_rewritten": 0,
                "rows_deleted": 0, "dv_bytes": 0,
            }
        dvdir = self._dv_dir(table)
        dvdir.mkdir(parents=True, exist_ok=True)
        # _dvs_staging_* matches vacuum's `_*_staging_*` orphan sweep, so
        # a writer crashing between the parquet write and the rename
        # leaves a stage dir that ages out like any other staging orphan
        stage = self.root / f"_dvs_staging_{uuid.uuid4().hex[:12]}"
        matches.write.mode("overwrite").parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        dv_name = f"dv-{uuid.uuid4().hex[:16]}.parquet"
        part.rename(dvdir / dv_name)
        shutil.rmtree(stage, ignore_errors=True)
        dv_bytes = (dvdir / dv_name).stat().st_size
        affected = sorted(
            r["rel"] for r in matches.select("rel").distinct().collect()
        )  # bounded by the candidate file count
        file_dvs = {rel: dvs.get(rel, []) + [dv_name] for rel in affected}
        try:
            if bucketed:
                touched = {rel.split("/", 1)[0] for rel in affected}
                self._commit_manifest(
                    table,
                    m["buckets"],
                    m["n_buckets"],
                    base_version=m["version"],
                    touched=touched,
                    file_dvs=file_dvs,
                    txn=txn,
                )
            else:
                self._commit_manifest(
                    table,
                    files=m["files"],
                    base_version=m["version"],
                    file_dvs=file_dvs,
                    txn=txn,
                )
        except IdempotentReplay:
            (dvdir / dv_name).unlink(missing_ok=True)  # orphaned sidecar
            return {
                "files_total": total, "files_rewritten": 0,
                "rows_deleted": 0, "dv_bytes": 0,
            }
        return {
            "files_total": total,
            "files_rewritten": 0,
            "rows_deleted": int(n_deleted),
            "dv_bytes": int(dv_bytes),
        }

    def update_where(
        self,
        table: str,
        predicates,
        set_values: dict,
        *,
        txn: tuple[str, int] | None = None,
    ) -> dict:
        """Row-level UPDATE: for every row matching ALL ``predicates``,
        assign ``set_values`` ({column: literal or Column expression}) —
        Delta's UPDATE on this manifest, the same FILE-GRANULAR shape as
        :meth:`delete_where`: the skipping stack picks candidate files,
        only those rewrite (matching rows transformed, non-matching
        carried verbatim inside the same file), one manifest commit
        publishes.  NULL predicates don't match (SQL semantics).

        Merge keys cannot be updated (that is a delete+insert — the
        key's bucket would change); unknown and type-changing
        assignments raise.  Returns ``{'files_total',
        'files_rewritten', 'rows_updated'}``."""
        preds = list(predicates)
        if not preds:
            raise ValueError(
                "update_where with no predicates would rewrite the whole "
                "table — filter explicitly"
            )
        if not set_values:
            raise ValueError("update_where needs at least one assignment")
        keys = MERGE_KEYS.get(table, [])
        bad = sorted(set(set_values) & set(keys))
        if bad:
            raise ValueError(
                f"table '{table}': cannot UPDATE merge-key columns {bad} — "
                f"a key change moves the row's bucket; delete + re-merge it"
            )
        if txn is not None:
            seen = self.last_txn_version(table, txn[0])
            if seen is not None and seen >= txn[1]:
                return {"files_total": 0, "files_rewritten": 0, "rows_updated": 0}
        mvs = self._manifest_versions(table)
        if not mvs:
            if any((self.root / table).glob("_kb=*")):
                dirb = self._dir_buckets(table)
                self._validate_bucket_modulus(table, dirb, self.N_KEY_BUCKETS)
                self._commit_manifest(table, dirb, self.N_KEY_BUCKETS)
            else:
                self._adopt_flat(table)
            mvs = self._manifest_versions(table)
        m = self._manifest(table, mvs[-1])
        lpreds = preds  # logical, for the row-level match below
        preds = self._preds_physical(preds, m)  # column mapping: renames
        cand, total = self._prune_rels(table, m, preds)
        if not cand:
            return {"files_total": total, "files_rewritten": 0, "rows_updated": 0}
        bucketed = "buckets" in m
        # DV-aware candidate read (see delete_where): tombstoned rows
        # neither match nor survive into the rewritten files.  The
        # update logic runs in LOGICAL space (user assignments and
        # predicates name logical columns); staging converts back.
        df = self._to_logical(
            self._read_files_dv(table, m, [(rel, str(p)) for rel, p in cand]), m
        )
        unknown = sorted(set(set_values) - set(df.columns))
        if unknown:
            raise ValueError(
                f"table '{table}': UPDATE assigns unknown columns {unknown} — "
                f"add them with a merge under allow_new_columns first"
            )
        match_expr = F.coalesce(self._predicate_expr(lpreds), F.lit(False))
        n_updated = df.filter(match_expr).count()
        if n_updated == 0:  # maybe-matching candidates, zero real matches
            return {"files_total": total, "files_rewritten": 0, "rows_updated": 0}
        # SQL UPDATE semantics: the predicate AND every assignment's RHS
        # evaluate against the OLD row — one select, not a withColumn
        # chain (a chained `size` assignment would flip the match for a
        # later `type` assignment; caught by the gate certifier)
        types = {f.name: f.dataType for f in df.schema.fields}
        rhs_cols = {
            col: (val if hasattr(val, "cast") else F.lit(val))
            for col, val in set_values.items()
        }
        # Type-changing assignments RAISE (mirroring _resolve_evolution)
        # rather than silently casting: with ANSI off, a failed cast
        # (set size='abc' on a long column) would write NULLs into every
        # matched row.  Lossless numeric widening (int→long, int→double)
        # and an explicit NULL are the only cross-type forms allowed
        # (_assignable_type); the residual cast below only normalizes
        # those.
        resolved = {
            f.name: f.dataType
            for f in df.select(
                *[c.alias(name) for name, c in rhs_cols.items()]
            ).schema.fields
        }

        bad = sorted(
            n for n in set_values if not _assignable_type(resolved[n], types[n])
        )
        if bad:
            raise ValueError(
                f"table '{table}': UPDATE changes column types for {bad} "
                f"(stored {[types[n].simpleString() for n in bad]}, "
                f"assigned {[resolved[n].simpleString() for n in bad]}) — "
                f"type changes require an explicit rewrite, not an UPDATE"
            )
        assigns = {}
        for col, new_col in rhs_cols.items():
            assigns[col] = F.when(match_expr, new_col.cast(types[col])).otherwise(
                F.col(col)
            )
        out_df = self._to_physical_df(
            df.select(*[assigns.get(c, F.col(c)).alias(c) for c in df.columns]),
            m,
        )
        cand_rels = {rel for rel, _p in cand}
        try:
            if bucketed:
                staged, fb = self._stage_bucketed(table, out_df)
                new_buckets = {}
                touched: set[str] = set()
                for b, fns in m["buckets"].items():
                    survivors = [fn for fn in fns if f"{b}/{fn}" not in cand_rels]
                    fresh = staged.get(b, [])
                    if len(survivors) != len(fns) or fresh:
                        touched.add(b)
                    new_buckets[b] = survivors + fresh
                self._commit_manifest(
                    table,
                    new_buckets,
                    m["n_buckets"],
                    base_version=m["version"],
                    touched=touched,
                    file_bytes=fb,
                    txn=txn,
                )
            else:
                staged_names, fb = self._stage_flat(
                    table, out_df, key_shuffle=False
                )
                survivors = [fn for fn in m["files"] if fn not in cand_rels]
                self._commit_manifest(
                    table,
                    files=survivors + staged_names,
                    base_version=m["version"],
                    file_bytes=fb,
                    txn=txn,
                )
        except IdempotentReplay:
            return {"files_total": total, "files_rewritten": 0, "rows_updated": 0}
        return {
            "files_total": total,
            "files_rewritten": len(cand),
            "rows_updated": int(n_updated),
        }

    def _read_files_pos(
        self, table: str, m: dict, pairs: list[tuple[str, str]]
    ) -> DataFrame:
        """Candidate files read WITH durable row identity — physical
        columns plus ``__rel`` (manifest-relative file name) and
        ``__pos`` (``_metadata.row_index``) — and the manifest's prior
        deletion vectors ALREADY APPLIED (a tombstoned position neither
        matches a predicate nor gets re-tombstoned).  The positional
        substrate every merge-on-read writer (DV delete, DV update,
        MOR MERGE) builds on: parquet's physical row order is
        immutable, so (file, row_index) identifies a row forever."""
        base = self.root / table
        bucketed = "buckets" in m
        schema = self._schema_of(m)
        rdr = self.spark.read if schema is None else self.spark.read.schema(schema)
        files = [p for _rel, p in pairs]
        fp = F.col("_metadata.file_path")
        if bucketed:
            raw = rdr.option("basePath", str(base)).parquet(*files)
            pat = r"_kb=(\d+)/([^/]+)$"
            rel_expr = F.concat(
                F.regexp_extract(fp, pat, 1),
                F.lit("/"),
                F.regexp_extract(fp, pat, 2),
            )
        else:
            raw = rdr.parquet(*files)
            rel_expr = F.element_at(F.split(fp, "/"), -1)
        df = raw.select(
            "*",
            rel_expr.alias("__rel"),
            F.col("_metadata.row_index").alias("__pos"),
        )
        dvs = m.get("dvs", {})
        names = sorted({n for rel, _p in pairs for n in dvs.get(rel, [])})
        if names:
            prior = (
                self.spark.read.schema("rel string, pos long")
                .parquet(*[str(self._dv_dir(table) / n) for n in names])
                .select(F.col("rel").alias("__rel"), F.col("pos").alias("__pos"))
            )
            df = df.join(prior, ["__rel", "__pos"], "left_anti")
        return df

    def _write_dv_sidecar(self, table: str, tombstones: DataFrame) -> tuple[str, int]:
        """Write (rel, pos) tombstones as ONE sidecar parquet under
        ``_dvs/<table>/`` and return (name, bytes).  The input must be
        small (positions of the rows ONE commit kills); staged under
        ``_dvs_staging_*`` so a crash before the rename leaves an
        orphan vacuum's ``_*_staging_*`` sweep ages out."""
        dvdir = self._dv_dir(table)
        dvdir.mkdir(parents=True, exist_ok=True)
        stage = self.root / f"_dvs_staging_{uuid.uuid4().hex[:12]}"
        tombstones.select(
            F.col("__rel").alias("rel"), F.col("__pos").alias("pos")
        ).coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        dv_name = f"dv-{uuid.uuid4().hex[:16]}.parquet"
        part.rename(dvdir / dv_name)
        shutil.rmtree(stage, ignore_errors=True)
        return dv_name, (dvdir / dv_name).stat().st_size

    def update_where_dv(
        self,
        table: str,
        predicates,
        set_values: dict,
        *,
        txn: tuple[str, int] | None = None,
    ) -> dict:
        """MERGE-ON-READ row-level UPDATE (Delta's DV + append design):
        instead of rewriting every candidate file with its matching
        rows transformed (:meth:`update_where` — O(file) write-amp for
        a point update), DV-TOMBSTONE the matching rows' old positions
        and APPEND one new file holding their updated images, in ONE
        manifest commit — the commit writes O(updated rows), not
        O(touched files).  Observationally identical to the
        copy-on-write path: read/scan/time travel/CDC/merge all agree
        (the gate certifier asserts it).

        Validation contract is exactly :meth:`update_where`'s: no
        empty predicate list, no merge-key assignment, unknown columns
        raise, type-changing assignments raise
        (:func:`_assignable_type`), predicates and assignment RHS
        evaluate against the OLD row, NULL predicates don't match.

        Returns ``{'files_total', 'files_rewritten': 0, 'rows_updated',
        'dv_bytes', 'appended_bytes'}`` — the two byte counts are the
        measured write volume (asserted O(changed rows) by the tests).
        """
        preds = list(predicates)
        if not preds:
            raise ValueError(
                "update_where_dv with no predicates would rewrite the whole "
                "table — filter explicitly"
            )
        if not set_values:
            raise ValueError("update_where_dv needs at least one assignment")
        keys = MERGE_KEYS.get(table, [])
        bad = sorted(set(set_values) & set(keys))
        if bad:
            raise ValueError(
                f"table '{table}': cannot UPDATE merge-key columns {bad} — "
                f"a key change moves the row's bucket; delete + re-merge it"
            )
        zero = {
            "files_total": 0, "files_rewritten": 0, "rows_updated": 0,
            "dv_bytes": 0, "appended_bytes": 0,
        }
        if txn is not None:
            seen = self.last_txn_version(table, txn[0])
            if seen is not None and seen >= txn[1]:
                return zero
        mvs = self._manifest_versions(table)
        if not mvs:
            if any((self.root / table).glob("_kb=*")):
                dirb = self._dir_buckets(table)
                self._validate_bucket_modulus(table, dirb, self.N_KEY_BUCKETS)
                self._commit_manifest(table, dirb, self.N_KEY_BUCKETS)
            else:
                self._adopt_flat(table)
            mvs = self._manifest_versions(table)
        m = self._manifest(table, mvs[-1])
        lpreds = preds  # logical, for the row-level match below
        preds = self._preds_physical(preds, m)  # column mapping: renames
        cand, total = self._prune_rels(table, m, preds)
        if not cand:
            return {**zero, "files_total": total}
        bucketed = "buckets" in m
        df = self._to_logical(
            self._read_files_pos(table, m, [(rel, str(p)) for rel, p in cand]),
            m,
        )
        data_cols = [c for c in df.columns if c not in ("__rel", "__pos")]
        unknown = sorted(set(set_values) - set(data_cols))
        if unknown:
            raise ValueError(
                f"table '{table}': UPDATE assigns unknown columns {unknown} — "
                f"add them with a merge under allow_new_columns first"
            )
        match_expr = F.coalesce(self._predicate_expr(lpreds), F.lit(False))
        # ONE pass over the candidates: the matched rows (with their
        # positions) are both the tombstone set and the update input
        matched = df.filter(match_expr).localCheckpoint(eager=True)
        n_updated = matched.count()
        if n_updated == 0:
            return {**zero, "files_total": total}
        types = {f.name: f.dataType for f in df.schema.fields}
        rhs_cols = {
            col: (val if hasattr(val, "cast") else F.lit(val))
            for col, val in set_values.items()
        }
        resolved = {
            f.name: f.dataType
            for f in df.select(
                *[c.alias(name) for name, c in rhs_cols.items()]
            ).schema.fields
        }
        bad = sorted(
            n for n in set_values if not _assignable_type(resolved[n], types[n])
        )
        if bad:
            raise ValueError(
                f"table '{table}': UPDATE changes column types for {bad} "
                f"(stored {[types[n].simpleString() for n in bad]}, "
                f"assigned {[resolved[n].simpleString() for n in bad]}) — "
                f"type changes require an explicit rewrite, not an UPDATE"
            )
        images = self._to_physical_df(
            matched.select(
                *[
                    (rhs_cols[c].cast(types[c]) if c in rhs_cols else F.col(c)).alias(c)
                    for c in data_cols
                ]
            ),
            m,
        )
        dv_name, dv_bytes = self._write_dv_sidecar(
            table, matched.select("__rel", "__pos")
        )
        affected = sorted(
            r["__rel"] for r in matched.select("__rel").distinct().collect()
        )  # bounded by the candidate file count
        dvs = m.get("dvs", {})
        file_dvs = {rel: dvs.get(rel, []) + [dv_name] for rel in affected}
        try:
            if bucketed:
                out_df = images.withColumn(
                    "_kb", self._key_bucket(table, m["n_buckets"])
                )
                staged, fb = self._stage_bucketed(table, out_df)
                new_buckets = dict(m["buckets"])
                touched = {rel.split("/", 1)[0] for rel in affected}
                for b, fresh in staged.items():
                    new_buckets[str(b)] = list(new_buckets.get(str(b), [])) + fresh
                    touched.add(str(b))
                self._commit_manifest(
                    table,
                    new_buckets,
                    m["n_buckets"],
                    base_version=m["version"],
                    touched=touched,
                    file_bytes=fb,
                    file_dvs=file_dvs,
                    txn=txn,
                )
            else:
                names, fb = self._stage_flat(
                    table, images.coalesce(1), key_shuffle=False
                )
                self._commit_manifest(
                    table,
                    files=list(m["files"]) + names,
                    base_version=m["version"],
                    file_bytes=fb,
                    file_dvs=file_dvs,
                    txn=txn,
                )
        except IdempotentReplay:
            (self._dv_dir(table) / dv_name).unlink(missing_ok=True)
            return {**zero, "files_total": total}
        return {
            "files_total": total,
            "files_rewritten": 0,
            "rows_updated": int(n_updated),
            "dv_bytes": dv_bytes,
            "appended_bytes": sum(
                (fb or {}).values()
            ),
        }

    @staticmethod
    def _predicate_expr(predicates):
        """The scan conjunction as ONE Column expression (three-valued:
        NULL where SQL says so — delete_where needs the exact
        complement, which _apply_predicates' filter chain can't give)."""
        expr = None
        for col, op, val in predicates:
            c = F.col(col)
            if op == "=":
                e = c == val
            elif op == "<":
                e = c < val
            elif op == "<=":
                e = c <= val
            elif op == ">":
                e = c > val
            elif op == ">=":
                e = c >= val
            elif op == "between":
                e = (c >= val[0]) & (c <= val[1])
            elif op == "in":
                e = c.isin(list(val))
            else:
                raise ValueError(f"unknown scan predicate op {op!r}")
            expr = e if expr is None else (expr & e)
        return expr

    def read_changes(
        self,
        table: str,
        from_version: int,
        to_version: int | None = None,
        *,
        update_images: bool = False,
        with_diagnostics: bool = False,
    ):
        """CDC: the row-level NET difference between two committed
        versions, as full rows plus a ``_change`` column (``'insert'``
        rows exist in ``to`` but not ``from``; ``'delete'`` the
        reverse; a last-write-wins update appears as its delete+insert
        pair).  The multiset identity ``from − deletes + inserts ==
        to`` holds exactly — an incremental consumer applies the
        changes instead of re-reading the table.

        ``update_images=True`` (Delta's CDF change types): delete+insert
        pairs sharing the table's MERGE KEYS are relabeled
        ``update_preimage`` / ``update_postimage`` — the signal CDC
        consumers key on to distinguish row MUTATION from key churn.
        The linking is one window over the change set (never the
        table); rows with a NULL key column, and tables without merge
        keys, keep the plain insert/delete labels.  The multiset
        identity still holds with preimage≡delete, postimage≡insert.

        Scale shape: when both versions are bucketed manifests at one
        modulus, the MANIFEST DIFF picks the buckets whose file lists
        differ and only those buckets' files — from both versions —
        are listed, opened, and anti-joined; a commit that touched k of
        B buckets costs O(k·table/B) to diff, not O(table).  Layout
        changes (flat↔bucketed, rebucket) and legacy snapshots fall
        back to a full two-version diff — correct, just unpruned.
        Compaction-style commits rewrite files without changing rows;
        their rewritten buckets read back equal and contribute nothing.

        With ``with_diagnostics=True`` returns ``(df, {'buckets_total',
        'buckets_read'})`` (Nones on the unpruned fallback)."""
        if to_version is None:
            to_version = (self.versions(table) or [-1])[-1]
        mvs = set(self._manifest_versions(table))
        diag = {"buckets_total": None, "buckets_read": None}
        old_df = new_df = None
        if from_version in mvs and to_version in mvs:
            mo = self._manifest(table, from_version)
            mn = self._manifest(table, to_version)
            if (
                "buckets" in mo
                and "buckets" in mn
                and mo.get("n_buckets")
                and mo.get("n_buckets") == mn.get("n_buckets")
            ):
                ob, nb = mo["buckets"], mn["buckets"]
                odv, ndv = mo.get("dvs", {}), mn.get("dvs", {})

                def _bdv(dvmap, bmap, b):
                    # a bucket's DV state: {rel: [dv names]} restricted
                    # to its files — a DV-only delete changes no file
                    # list, so the diff must ALSO compare this
                    return {
                        f"{b}/{fn}": dvmap[f"{b}/{fn}"]
                        for fn in bmap.get(b, [])
                        if f"{b}/{fn}" in dvmap
                    }

                changed = sorted(
                    (
                        b
                        for b in set(ob) | set(nb)
                        if ob.get(b) != nb.get(b)
                        or _bdv(odv, ob, b) != _bdv(ndv, nb, b)
                    ),
                    key=int,
                )
                diag = {
                    "buckets_total": len(set(ob) | set(nb)),
                    "buckets_read": len(changed),
                }
                base = self.root / table

                def _sub(m, bmap, bs):
                    schema = self._schema_of(m)
                    pairs = [
                        (f"{b}/{fn}", str(base / f"_kb={b}" / fn))
                        for b in bs
                        for fn in bmap.get(b, [])
                    ]
                    if not pairs:
                        if schema is not None:
                            return self.spark.createDataFrame([], schema)
                        if table in ALL_TABLES:
                            return self.spark.createDataFrame(
                                [], ALL_TABLES[table][0]
                            )
                        return self._read_manifest(table, to_version).limit(0).drop("_kb")
                    return self._read_files_dv(table, m, pairs).drop("_kb")

                # both sides diff in PHYSICAL space, then surface under
                # the TO version's column mapping (Delta's CDC contract:
                # a rename is metadata-only — zero row changes, and the
                # feed speaks the destination schema)
                old_df = self._to_logical(_sub(mo, ob, changed), mn)
                new_df = self._to_logical(_sub(mn, nb, changed), mn)
        if old_df is None:
            old_df = self.read(table, version=from_version)
            new_df = self.read(table, version=to_version)
            if from_version in mvs and to_version in mvs:
                mo2 = self._manifest(table, from_version)
                mn2 = self._manifest(table, to_version)
                # re-map the FROM side to the TO version's logical names
                old_df = self._to_logical(self._to_physical_df(old_df, mo2), mn2)
        # schema evolution between the versions: align BOTH sides to the
        # union of their schemas (absent columns read as typed nulls on
        # either side), so an untouched row is NOT reported as changed
        # just because a column was added — or rolled back
        if old_df.columns != new_df.columns:
            have = set(old_df.columns)
            fields = list(old_df.schema.fields) + [
                f for f in new_df.schema.fields if f.name not in have
            ]
            old_df = self._align_columns(old_df, fields)
            new_df = self._align_columns(new_df, fields)
        inserts = new_df.exceptAll(old_df).withColumn("_change", F.lit("insert"))
        deletes = old_df.exceptAll(new_df).withColumn("_change", F.lit("delete"))
        out = inserts.unionByName(deletes)
        if update_images:
            keys = MERGE_KEYS.get(table, [])
            cmn = (
                self._colmap_of(self._manifest(table, to_version))
                if to_version in mvs
                else {}
            )
            lkeys = [cmn.get(k, k) for k in keys]
            if lkeys and all(k in out.columns for k in lkeys):
                w = Window.partitionBy(*lkeys)
                has_ins = (
                    F.max(F.when(F.col("_change") == "insert", 1).otherwise(0)).over(w)
                    == 1
                )
                has_del = (
                    F.max(F.when(F.col("_change") == "delete", 1).otherwise(0)).over(w)
                    == 1
                )
                nonnull = F.lit(True)
                for k in lkeys:
                    nonnull = nonnull & F.col(k).isNotNull()
                paired = has_ins & has_del & nonnull
                out = out.withColumn(
                    "_change",
                    F.when(paired & (F.col("_change") == "delete"), "update_preimage")
                    .when(paired & (F.col("_change") == "insert"), "update_postimage")
                    .otherwise(F.col("_change")),
                )
        return (out, diag) if with_diagnostics else out

    # ------------------------------------------------- snapshot versioning
    #
    # Legacy store: the pre-manifest protocol archived replaced table
    # directories under _versions/<table>/vNNNNN.  Those snapshots stay
    # readable and vacuumable; new commits are manifest-only.

    def _version_dir(self, table: str) -> Path:
        return self.root / "_versions" / table

    def _legacy_versions(self, table: str) -> list[int]:
        vd = self._version_dir(table)
        if not vd.exists():
            return []
        return sorted(int(p.name[1:]) for p in vd.glob("v*") if p.is_dir())

    def versions(self, table: str) -> list[int]:
        """Committed version numbers for a table, oldest first — one
        monotone sequence spanning legacy directory snapshots and
        manifests. The highest manifest IS the live state."""
        return sorted(self._legacy_versions(table) + self._manifest_versions(table))

    def rollback(self, table: str, version: int) -> None:
        """Restore a table to a committed version. Rollback is itself a
        commit: when the target version's layout matches the live one
        (flat→flat, bucketed→bucketed) it publishes a NEW manifest that
        repeats the target's file list — pure metadata, zero data bytes
        moved.  Rolling back ACROSS a layout change (flat↔bucketed
        conversion, or a legacy directory snapshot) re-materializes the
        target's content as new immutable files — an O(snapshot) commit
        at the LIVE layout.  Either way every other version stays
        readable, so rolling forward again remains possible."""
        mvs = self._manifest_versions(table)
        newest = self._manifest(table, mvs[-1]) if mvs else None
        target = self._manifest(table, version) if version in mvs else None
        if target is None and not (self._version_dir(table) / f"v{version:05d}").exists():
            raise FileNotFoundError(
                f"no version {version} for '{table}' (available: {self.versions(table)})"
            )
        if target is not None and newest is not None:
            same_layout = ("buckets" in target) == ("buckets" in newest)
            if same_layout:
                # pure-metadata commit repeating the target's file list
                # (a bucketed target carries its OWN n_buckets — rolling
                # back across a rebucket restores the old modulus with it)
                if "buckets" in target:
                    t_rels = [
                        f"{b}/{fn}"
                        for b, fs in target["buckets"].items()
                        for fn in fs
                    ]
                else:
                    t_rels = list(target["files"])
                t_dvs = target.get("dvs", {})
                self._commit_manifest(
                    table,
                    target.get("buckets"),
                    target.get("n_buckets"),
                    files=target.get("files"),
                    base_version=mvs[-1],
                    file_bytes=target.get("bytes"),
                    file_stats=target.get("stats"),
                    # restore EXACTLY the target's deletion-vector state:
                    # an empty list clears a head-side DV on a shared
                    # file (rolling back past a DV delete un-deletes)
                    file_dvs={rel: t_dvs.get(rel, []) for rel in t_rels},
                    schema_json=target.get("schema"),
                )
                return
        if newest is not None and "buckets" in newest:
            # live is bucketed, target is flat (manifest or legacy
            # snapshot): re-bucket the target's content as new files —
            # the same one-time O(snapshot) pass the conversion paid;
            # the layout and its pinned count survive, so later
            # incremental commits keep working
            nb = newest["n_buckets"] or self.N_KEY_BUCKETS
            df = self.read(table, version=version).withColumn(
                "_kb", self._key_bucket(table, nb)
            )
            new_buckets, fb = self._stage_bucketed(table, df)
            self._commit_manifest(
                table,
                new_buckets,
                nb,
                base_version=mvs[-1],
                file_bytes=fb,
                schema_json=(target or {}).get("schema"),
            )
            return
        # live is flat; target is a legacy directory snapshot → rewrite
        # its content as new root files (adopting a never-manifested live
        # directory first, so the pre-rollback state stays readable)
        if newest is None and (self.root / table).exists():
            self._adopt_flat(table)
            mvs = self._manifest_versions(table)
        names, fb = self._stage_flat(table, self.read(table, version=version))
        self._commit_manifest(
            table,
            files=names,
            base_version=(self.versions(table) or [-1])[-1],
            file_bytes=fb,
            schema_json=(target or {}).get("schema"),
        )

    # -------------------------------------------- consumer registration
    def register_consumer(self, name: str, table: str, version: int) -> None:
        """Record that change-feed consumer ``name`` has applied
        ``table`` through ``version`` (its durable offset, mirrored
        into the warehouse).  :meth:`vacuum` then retains every
        manifest version >= the slowest registered consumer's offset,
        so a lagging replica can never find its next diff vacuumed
        away — the retention guard Delta solves with time-based
        retention windows, solved here with EXACT offsets (no
        guessing how far behind a consumer might be)."""
        import re

        if not re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name):
            raise ValueError(f"consumer name {name!r} must be a simple slug")
        cd = self.root / "_consumers"
        cd.mkdir(parents=True, exist_ok=True)
        p = cd / f"{name}.json"
        doc = {}
        if p.exists():
            try:
                doc = json.loads(p.read_text())
            except ValueError:
                doc = {}
        if doc.get(table, -1) > version:
            raise ValueError(
                f"consumer {name!r} offset for '{table}' would move "
                f"BACKWARD ({doc[table]} -> {version}) — offsets are monotone"
            )
        doc[table] = version
        tmp = p.with_suffix(f".{uuid.uuid4().hex[:8]}.tmp")
        tmp.write_text(json.dumps(doc, sort_keys=True))
        os.replace(tmp, p)  # atomic

    def consumer_offsets(self, table: str) -> dict[str, int]:
        """{consumer name: applied-through version} for ``table``."""
        cd = self.root / "_consumers"
        out: dict[str, int] = {}
        if not cd.exists():
            return out
        for p in cd.glob("*.json"):
            try:
                doc = json.loads(p.read_text())
            except ValueError:
                continue
            if table in doc:
                out[p.stem] = int(doc[table])
        return out

    def deregister_consumer(self, name: str) -> None:
        (self.root / "_consumers" / f"{name}.json").unlink(missing_ok=True)

    def vacuum(
        self, keep_last: int = 2, *, staging_ttl_hours: float = 24.0
    ) -> dict[str, int]:
        """Drop all but the newest ``keep_last`` non-live versions per
        table (time-travel horizon vs storage), then delete every data
        file unreachable from the retained manifests (which also sweeps
        orphans left by crashed or conflicted commits: the manifest is
        the precise reachable-file set). Returns
        {table: n_versions_removed}.

        Staging dirs (``_<table>_*staging*_<uuid>``) belong to
        IN-FLIGHT writers; a crashed writer abandons one.  Vacuum sweeps
        those older than ``staging_ttl_hours`` (mtime) — the TTL keeps a
        concurrent writer's live staging safe, the same contract as
        Delta's orphan-file retention window.  Pass 0 only when no
        writer can be running."""
        import time

        cutoff = time.time() - staging_ttl_hours * 3600.0
        for pat in ("_*_staging_*", "_*_compact_*"):
            for d in self.root.glob(pat):
                if d.is_dir() and d.stat().st_mtime <= cutoff:
                    shutil.rmtree(d, ignore_errors=True)
        out: dict[str, int] = {}
        for name in ALL_TABLES:
            removed = 0
            mvs = self._manifest_versions(name)
            if mvs:
                # the newest manifest is the live state; keep it plus the
                # newest keep_last older versions (either store)
                all_vs = self.versions(name)
                retain = set(all_vs[-(keep_last + 1):]) if keep_last > 0 else {all_vs[-1]}
                retain.add(mvs[-1])
                # retention GUARD: a registered change-feed consumer at
                # offset k needs manifests k..head to compute its next
                # diffs — keep them regardless of keep_last (the
                # consumer advances, re-vacuum reclaims)
                offs = self.consumer_offsets(name)
                if offs:
                    floor = min(offs.values())
                    retain |= {v for v in all_vs if v >= floor}
                for v in mvs:
                    if v not in retain:
                        (self._manifest_dir(name) / f"v{v:05d}.json").unlink()
                        removed += 1
                for v in self._legacy_versions(name):
                    if v not in retain:
                        shutil.rmtree(self._version_dir(name) / f"v{v:05d}")
                        removed += 1
                reach_kb: set[str] = set()
                reach_flat: set[str] = set()
                reach_blooms: set[str] = set()
                reach_dvs: set[str] = set()
                for v in self._manifest_versions(name):
                    m = self._manifest(name, v)
                    if "buckets" in m:
                        for b, files in m["buckets"].items():
                            reach_kb |= {f"_kb={b}/{fn}" for fn in files}
                    else:
                        reach_flat |= set(m["files"])
                    reach_blooms |= set(m.get("blooms", {}).values())
                    for lst in m.get("dvs", {}).values():
                        reach_dvs |= set(lst)
                bdir = self.root / "_blooms" / name
                if bdir.exists():
                    for f in bdir.glob("*.json"):
                        if f.name not in reach_blooms:
                            f.unlink()  # bloom of an expired file
                dvd = self._dv_dir(name)
                if dvd.exists():
                    for f in dvd.glob("dv-*.parquet"):
                        if f.name not in reach_dvs:
                            f.unlink()  # tombstones of expired versions
                tdir = self.root / name
                for f in tdir.glob("_kb=*/*"):
                    rel = f"{f.parent.name}/{f.name}"
                    if f.is_file() and not f.name.startswith((".", "_")) and rel not in reach_kb:
                        f.unlink()
                        crc = f.with_name(f".{f.name}.crc")  # local-FS sidecar
                        if crc.exists():
                            crc.unlink()
                for f in tdir.glob("part-*"):
                    if f.is_file() and f.name not in reach_flat:
                        f.unlink()
                        crc = f.with_name(f".{f.name}.crc")
                        if crc.exists():
                            crc.unlink()
            else:
                vs = self._legacy_versions(name)
                drop = vs[:-keep_last] if keep_last > 0 else vs
                for v in drop:
                    shutil.rmtree(self._version_dir(name) / f"v{v:05d}")
                removed = len(drop)
            if removed:
                out[name] = removed
        return out

    def history(self, table: str) -> list[dict]:
        """Version metadata, oldest first (the DESCRIBE HISTORY of this
        table-format-lite): one row per committed version —
        ``{version, kind: 'snapshot'|'manifest'|'live', n_files,
        bytes, n_buckets}``.  Snapshot rows stat the archived
        directory; manifest rows stat exactly the files the manifest
        lists (shared files are counted in every version that can read
        them — the row answers "what does read(version=v) cost", not
        "what does this version own"); a never-merged table gets a
        single 'live' row whose version number :meth:`read` accepts.
        Stat calls are memoized per shared file, so a thousand-version
        history costs O(distinct files), not O(versions × files)."""
        sizes: dict[Path, int] = {}

        def _sz(p: Path) -> int:
            if p not in sizes:
                sizes[p] = p.stat().st_size if p.exists() else 0
            return sizes[p]

        rows: list[dict] = []
        for v in self._legacy_versions(table):
            d = self._version_dir(table) / f"v{v:05d}"
            files = [f for f in d.rglob("part-*") if f.is_file()]
            rows.append(
                {
                    "version": v,
                    "kind": "snapshot",
                    "n_files": len(files),
                    "bytes": sum(f.stat().st_size for f in files),
                    "n_buckets": None,
                }
            )
        mvs = self._manifest_versions(table)
        for v in mvs:
            m = self._manifest(table, v)
            if "buckets" in m:
                rels = [
                    (f"{b}/{fn}", self.root / table / f"_kb={b}" / fn)
                    for b, fs in m["buckets"].items()
                    for fn in fs
                ]
            else:
                rels = [(fn, self.root / table / fn) for fn in m["files"]]
            bm = m.get("bytes")
            if bm is not None and all(r in bm for r, _p in rels):
                total = sum(bm[r] for r, _p in rels)  # pure metadata
            else:  # pre-size-map manifest: stat once per distinct file
                total = sum(_sz(p) for _r, p in rels)
            rows.append(
                {
                    "version": v,
                    "kind": "manifest",
                    "n_files": len(rels),
                    "bytes": total,
                    "n_buckets": m.get("n_buckets"),
                }
            )
        if not mvs and (self.root / table).exists():
            files = [
                f for f in (self.root / table).glob("part-*") if f.is_file()
            ]
            rows.append(
                {
                    "version": (self.versions(table) or [-1])[-1] + 1,
                    "kind": "live",
                    "n_files": len(files),
                    "bytes": sum(f.stat().st_size for f in files),
                    "n_buckets": None,
                }
            )
        return sorted(rows, key=lambda r: r["version"])

    def last_txn_version(self, table: str, app: str) -> int | None:
        """Highest ``txn`` version committed for ``app`` on ``table``
        (None if never) — the restart hook for an idempotent writer:
        resume emitting from the next version after a checkpoint loss."""
        mvs = self._manifest_versions(table)
        if not mvs:
            return None
        return self._manifest(table, mvs[-1]).get("txn", {}).get(app)

    # ------------------------------------------- catalog (multi-table txn)
    #
    # A CATALOG COMMIT is one atomic object pinning {table: version} for
    # every table of a multi-table import — the all-or-nothing layer the
    # per-table manifests cannot give alone.  A graph import writes 10
    # tables; with only per-table commits a crash can publish functions
    # without their calls.  Readers that resolve through
    # :meth:`catalog_snapshot` see either the complete old import or the
    # complete new one, never a torn middle.  (The reference is one Bolt
    # round trip per ENTITY — importer.rs:86-320 — so it cannot offer
    # this at all.)

    def _catalog_dir(self) -> Path:
        return self.root / "_catalog"

    def catalog_versions(self) -> list[int]:
        cd = self._catalog_dir()
        if not cd.exists():
            return []
        return sorted(int(p.stem[1:]) for p in cd.glob("v*.json"))

    def catalog_snapshot(self, version: int | None = None) -> dict[str, int]:
        """The {table: manifest version} pin set of a catalog commit
        (newest by default).  Read each table with
        ``read(t, version=pins[t])`` for a consistent multi-table view;
        an empty dict means no catalog commit exists yet."""
        cvs = self.catalog_versions()
        if not cvs:
            return {}
        v = cvs[-1] if version is None else version
        p = self._catalog_dir() / f"v{v:05d}.json"
        return json.loads(p.read_text())["pins"]

    def read_snapshot(self, table: str, pins: dict[str, int] | None = None) -> DataFrame:
        """Read ``table`` at the catalog-pinned version (falls back to
        the live head for tables the catalog has never pinned)."""
        pins = self.catalog_snapshot() if pins is None else pins
        v = pins.get(table)
        return self.read(table) if v is None else self.read(table, version=v)

    def _commit_catalog(
        self, pins: dict[str, int], txn: tuple[str, int] | None = None
    ) -> int:
        """Publish a catalog version with the same atomic
        create-if-absent device as table manifests (os.link; the
        object-store analog is one conditional PUT).

        ``pins`` are THIS commit's updates, rebased over whatever pins
        the head catalog doc carries at publish time: on every retry
        the head is re-read and the update set is merged over its pin
        map, so a concurrent ``import_atomic`` of a DISJOINT table set
        keeps its pins instead of being silently overwritten by a
        stale snapshot (the same disjoint-rebase rule the manifest
        commit applies to buckets)."""
        cd = self._catalog_dir()
        cd.mkdir(parents=True, exist_ok=True)
        for _ in range(50):
            cvs = self.catalog_versions()
            head = cvs[-1] if cvs else -1
            head_pins: dict[str, int] = {}
            if cvs:
                doc0 = json.loads((cd / f"v{head:05d}.json").read_text())
                head_pins = dict(doc0.get("pins", {}))
                if txn is not None and doc0.get("txn", {}).get(txn[0], -1) >= txn[1]:
                    return head  # idempotent replay
                prev_txn = dict(doc0.get("txn", {}))
            else:
                prev_txn = {}
            if txn is not None:
                prev_txn[txn[0]] = txn[1]
            nxt = head + 1
            merged = {**head_pins, **pins}
            doc = {"version": nxt, "pins": dict(sorted(merged.items()))}
            if prev_txn:
                doc["txn"] = prev_txn
            tmp = cd / f".v{nxt:05d}.{uuid.uuid4().hex[:12]}.tmp"
            tmp.write_text(json.dumps(doc, sort_keys=True))
            try:
                os.link(tmp, cd / f"v{nxt:05d}.json")
                return nxt
            except FileExistsError:
                continue
            finally:
                tmp.unlink(missing_ok=True)
        raise ConcurrentCommitError("catalog: gave up after 50 commit conflicts")

    def import_atomic(
        self,
        tables: dict[str, DataFrame],
        *,
        txn: tuple[str, int],
        batch_seq: int = 1,
        incremental: bool = True,
        _crash_after: int | None = None,
    ) -> int:
        """Multi-table import, ATOMIC at the catalog level.  Each table
        merges with the shared ``txn=(app, version)`` idempotence key,
        then ONE catalog commit pins the resulting versions.

        Crash contract: a writer dying BETWEEN table commits leaves the
        catalog untouched — snapshot readers keep seeing the complete
        previous import (the advanced per-table manifests are invisible
        until pinned).  Re-running the SAME (app, version) converges:
        already-committed tables replay as no-ops (IdempotentReplay),
        the rest commit, and the catalog pin finally publishes.  The
        catalog commit itself is idempotent on the same key.

        ``_crash_after`` (tests only) kills the writer after that many
        table commits — the crash-injection hook the certifier uses.
        Returns the catalog version."""
        done = 0
        for name in sorted(tables):
            df = tables[name]
            if incremental:
                self.merge_batch_incremental(
                    {name: df}, batch_seq=batch_seq, txn=txn
                )
            else:
                self.merge_batch({name: df}, batch_seq=batch_seq, txn=txn)
            done += 1
            if _crash_after is not None and done >= _crash_after:
                raise RuntimeError(
                    f"injected crash after {done} table commits"
                )
        pins = {
            name: self._manifest_versions(name)[-1] for name in tables
        }
        return self._commit_catalog(pins, txn=txn)

    # ----------------------------------------------------- manifest store
    def _manifest_dir(self, table: str) -> Path:
        return self.root / "_manifests" / table

    def _manifest_versions(self, table: str) -> list[int]:
        md = self._manifest_dir(table)
        if not md.exists():
            return []
        return sorted(int(p.stem[1:]) for p in md.glob("v*.json"))

    def _manifest(self, table: str, version: int) -> dict:
        p = self._manifest_dir(table) / f"v{version:05d}.json"
        if not p.exists():
            raise FileNotFoundError(
                f"warehouse table '{table}' has no manifest v{version} "
                f"(available: {self.versions(table)})"
            )
        return json.loads(p.read_text())

    def _commit_manifest(
        self,
        table: str,
        buckets: dict[str, list[str]] | None = None,
        n_buckets: int | None = None,
        *,
        files: list[str] | None = None,
        base_version: int | None = None,
        touched: set[str] | None = None,
        file_bytes: dict[str, int] | None = None,
        file_stats: dict[str, dict] | None = None,
        file_dvs: dict[str, list[str]] | None = None,
        txn: tuple[str, int] | None = None,
        schema_json: str | None | object = "__carry__",
        colmap: dict | None | object = "__carry__",
        max_retries: int = 20,
    ) -> int:
        """Publish a new table version with OPTIMISTIC CONCURRENCY (the
        Delta/Iceberg commit loop).  The manifest is created with an
        atomic create-if-absent (``os.link`` of a staged temp file — a
        hard link fails with EEXIST if the target exists; the object-
        store analog is one conditional PUT / If-None-Match), so of two
        writers racing on a version number exactly one wins.  The loser
        re-reads the head and, when this commit is an incremental
        bucket rewrite (``touched`` given) whose buckets are disjoint
        from every intervening commit's, REBASES: its touched buckets'
        new file lists are re-applied onto the head's map and the
        publish retries.  Overlapping buckets — or any conflict against
        a whole-table commit (``touched=None``) — raise
        :class:`ConcurrentCommitError`: the merged content was computed
        against a base another writer has since changed, so replaying,
        not rebasing, is the only safe outcome.

        ``base_version`` is the version the writer's read was based on
        (defaults to the head at publish time, i.e. no conflict
        detection for adoption-style metadata commits).

        The manifest also records per-file SIZES (``bytes``): the
        writer passes sizes for the files it just wrote
        (``file_bytes``), carried files inherit theirs from the head's
        manifest, and anything still unknown (one-time adoption of a
        pre-manifest directory) is statted once at commit.  Readers of
        ``history()`` / ``recommended_buckets`` then never touch the
        filesystem — at object-store scale, per-file stat calls are a
        LIST storm this map exists to avoid.

        It additionally records per-file ZONE MAPS (``stats``:
        rel → {col: [min, max]}, footer-derived — see
        :func:`_parquet_minmax`): same carry-forward rule (pass
        ``file_stats`` for rollback-style metadata commits that repeat
        an older manifest's files; new files are footer-read once at
        commit).  :meth:`scan` prunes on these without opening a single
        data file.

        ``txn=(app, version)`` makes the commit IDEMPOTENT per writer
        (Delta's txnAppId/txnVersion): the manifest carries a monotone
        ``txn`` map {app: highest committed version}; if the head
        already records ``app`` at >= ``version`` — including when
        that head appears mid-retry, i.e. this writer's own ack was
        lost and a twin already won — :class:`IdempotentReplay` is
        raised instead of publishing a duplicate.  The map carries
        forward across every commit (rollback included: an applied
        batch stays applied).

        ``schema_json`` (SCHEMA EVOLUTION): the manifest records the
        table's logical schema once it diverges from the registered
        one.  Default carries the head's schema forward (layout-only
        commits — compaction, rebucket — never change it); an
        evolution commit passes the evolved ``StructType.json()``;
        rollback passes the TARGET's (None clears, restoring the
        pre-evolution schema)."""
        md = self._manifest_dir(table)
        md.mkdir(parents=True, exist_ok=True)
        base = (
            base_version
            if base_version is not None
            else (self.versions(table) or [-1])[-1]
        )
        cur_buckets = buckets
        built_blooms: dict[str, str] = {}  # sidecars built by THIS call
        for attempt in range(max_retries + 1):
            head = (self.versions(table) or [-1])[-1]
            head_man = (
                self._manifest(table, head)
                if head in set(self._manifest_versions(table))
                else None
            )
            # replay check BEFORE rebase: a twin that committed this
            # (app, version) often rewrote the same buckets — that is a
            # replay to skip, not a conflict to raise
            if (
                txn is not None
                and head_man is not None
                and head_man.get("txn", {}).get(txn[0], -1) >= txn[1]
            ):
                raise IdempotentReplay(table, *txn)
            if head != base:
                cur_buckets = self._rebase_buckets(
                    table, base, head, cur_buckets, n_buckets, touched, files
                )
                base = head
            nxt = head + 1
            if files is not None:
                doc = {"version": nxt, "n_buckets": None, "files": sorted(files)}
                rels = list(doc["files"])
            else:
                doc = {
                    "version": nxt,
                    "n_buckets": n_buckets,
                    "buckets": {
                        str(b): sorted(fs)
                        for b, fs in sorted(
                            cur_buckets.items(), key=lambda kv: int(kv[0])
                        )
                    },
                }
                rels = [
                    f"{b}/{fn}" for b, fs in doc["buckets"].items() for fn in fs
                ]
            prev_bytes: dict[str, int] = {}
            prev_stats: dict[str, dict] = {}
            prev_txn: dict[str, int] = {}
            prev_blooms: dict[str, str] = {}
            prev_dvs: dict[str, list[str]] = {}
            if head_man is not None:
                prev_bytes = head_man.get("bytes", {})
                prev_stats = head_man.get("stats", {})
                prev_txn = head_man.get("txn", {})
                prev_blooms = head_man.get("blooms", {})
                prev_dvs = head_man.get("dvs", {})
            bmap: dict[str, int] = {}
            smap: dict[str, dict] = {}
            blmap: dict[str, str] = {}
            # DELETION VECTORS carry per rel like bytes/stats: a commit
            # that stacks/clears a file's DV list passes file_dvs for
            # it; a carried file keeps its list; a REWRITTEN file has a
            # fresh name, so its DVs drop automatically (purge-on-
            # rewrite — compaction and CoW DML never see stale DVs)
            dvmap: dict[str, list[str]] = {}
            for rel in rels:
                if file_dvs is not None and rel in file_dvs:
                    if file_dvs[rel]:
                        dvmap[rel] = sorted(file_dvs[rel])
                elif rel in prev_dvs:
                    dvmap[rel] = prev_dvs[rel]
            for rel in rels:
                if files is not None:
                    p = self.root / table / rel
                else:
                    b, fn = rel.split("/", 1)
                    p = self.root / table / f"_kb={b}" / fn
                if file_bytes is not None and rel in file_bytes:
                    bmap[rel] = file_bytes[rel]
                elif rel in prev_bytes:
                    bmap[rel] = prev_bytes[rel]
                else:  # one-time adoption of pre-manifest files
                    bmap[rel] = p.stat().st_size if p.exists() else 0
                if file_stats is not None and rel in file_stats:
                    smap[rel] = file_stats[rel]
                elif rel in prev_stats:
                    smap[rel] = prev_stats[rel]
                elif p.exists():  # new or adopted file: one footer read
                    try:
                        smap[rel] = _parquet_minmax(p)
                    except OSError:
                        smap[rel] = {}  # unreadable footer → unprunable
                bcols = self.bloom_columns.get(table)
                if rel in prev_blooms:  # carried files keep their blooms
                    blmap[rel] = prev_blooms[rel]
                elif bcols:
                    if rel in built_blooms:
                        blmap[rel] = built_blooms[rel]
                    elif p.exists():
                        # new file of a bloom-indexed table: build once
                        # (cached across commit-loop retries)
                        bl = _build_file_bloom(p, bcols)
                        if bl:
                            bdir = self.root / "_blooms" / table
                            bdir.mkdir(parents=True, exist_ok=True)
                            sc = f"{uuid.uuid4().hex[:16]}.json"
                            (bdir / sc).write_text(json.dumps(bl))
                            built_blooms[rel] = sc
                            blmap[rel] = sc
            doc["bytes"] = bmap
            doc["stats"] = smap
            if blmap:
                doc["blooms"] = blmap
            if dvmap:
                doc["dvs"] = dvmap
            if txn is not None:
                prev_txn = dict(prev_txn)
                prev_txn[txn[0]] = txn[1]
            if prev_txn:
                doc["txn"] = prev_txn
            sj = (
                (head_man or {}).get("schema")
                if schema_json == "__carry__"
                else schema_json
            )
            if sj:
                doc["schema"] = sj
            # COLUMN MAPPING (renames): {physical: logical} carried like
            # the schema; a rename/restore commit passes its own map
            cm = (
                (head_man or {}).get("colmap")
                if colmap == "__carry__"
                else colmap
            )
            if cm:
                doc["colmap"] = cm
            # commit wall-clock for timestamp time travel (Delta's
            # TIMESTAMP AS OF): the PUBLISH time, re-stamped on every
            # retry so the winning manifest carries when it actually
            # became visible.  Clamped to be MONOTONE over the previous
            # manifest's committed_at (Delta's in-commit timestamp
            # adjustment): with multi-writer clock skew a later version
            # could otherwise carry an earlier stamp, making TIMESTAMP
            # AS OF resolve to a version that skips an intermediate one.
            import time as _time

            prev_ts = (head_man or {}).get("committed_at")
            doc["committed_at"] = round(_time.time(), 3)
            if prev_ts is not None and doc["committed_at"] <= prev_ts:
                doc["committed_at"] = round(prev_ts + 0.001, 3)
            # tmp name unique per WRITER, not just per process: two
            # threads racing on one version with a shared tmp would
            # link each other's content or unlink a live tmp
            tmp = md / f".v{nxt:05d}.{uuid.uuid4().hex[:12]}.tmp"
            tmp.write_text(json.dumps(doc, sort_keys=True))
            try:
                os.link(tmp, md / f"v{nxt:05d}.json")  # atomic create-if-absent
                return nxt
            except FileExistsError:
                continue  # lost the race on this version: re-read the head
            finally:
                tmp.unlink(missing_ok=True)
        raise ConcurrentCommitError(
            f"table '{table}': gave up after {max_retries} commit conflicts"
        )

    def _rebase_buckets(
        self,
        table: str,
        base: int,
        head: int,
        buckets: dict[str, list[str]] | None,
        n_buckets: int | None,
        touched: set[str] | None,
        files: list[str] | None,
    ) -> dict[str, list[str]]:
        """Rebase a conflicted incremental commit onto the new head, or
        raise. Valid only when every intervening commit is a bucketed
        manifest at the same modulus whose changed buckets are disjoint
        from this commit's ``touched`` set — then the touched buckets'
        merged content (computed against ``base``) is still exact, and
        overlaying it on the head's map serializes both writers."""
        if touched is None or files is not None or buckets is None:
            raise ConcurrentCommitError(
                f"table '{table}': commit based on v{base} conflicts with head "
                f"v{head}, and this commit rewrites the whole table — re-run it "
                f"against the new head"
            )
        man_vs = set(self._manifest_versions(table))
        inter = list(range(base + 1, head + 1))
        if base not in man_vs or any(v not in man_vs for v in inter):
            raise ConcurrentCommitError(
                f"table '{table}': conflicting versions between v{base} and "
                f"v{head} are not bucketed manifests — cannot rebase"
            )
        prev = self._manifest(table, base)
        if "buckets" not in prev:
            raise ConcurrentCommitError(
                f"table '{table}': base v{base} is a flat manifest — cannot rebase"
            )
        changed: set[str] = set()
        cur = prev["buckets"]
        for v in inter:
            m = self._manifest(table, v)
            if "buckets" not in m or (
                m.get("n_buckets") is not None
                and n_buckets is not None
                and m["n_buckets"] != n_buckets
            ):
                raise ConcurrentCommitError(
                    f"table '{table}': intervening commit v{v} changed the "
                    f"table layout — cannot rebase"
                )
            mb = m["buckets"]
            changed |= {b for b in set(cur) | set(mb) if cur.get(b) != mb.get(b)}
            cur = mb
        overlap = changed & set(touched)
        if overlap:
            raise ConcurrentCommitError(
                f"table '{table}': concurrent commits both rewrote buckets "
                f"{sorted(overlap, key=int)[:5]} — the loser's merge is stale; "
                f"re-run it against the new head"
            )
        out = dict(cur)
        for b in touched:
            out[b] = buckets.get(b, [])
        return out

    def _dir_buckets(self, table: str) -> dict[str, list[str]]:
        """Bucket→file map from the current directory state (used once,
        to ADOPT a pre-manifest bucketed table)."""
        path = self.root / table
        return {
            d.name.split("=", 1)[1]: sorted(
                f.name for f in d.glob("part-*") if f.is_file()
            )
            for d in path.glob("_kb=*")
            if d.is_dir()
        }

    def _adopt_flat(self, table: str) -> int:
        """Adopt a pre-manifest flat directory (or a freshly initialized
        empty table) as its first manifest — a metadata-only commit, so
        the pre-existing state becomes a readable version."""
        files = sorted(
            f.name for f in (self.root / table).glob("part-*") if f.is_file()
        )
        return self._commit_manifest(table, files=files)

    def _validate_bucket_modulus(
        self, table: str, buckets: dict[str, list[str]], n_buckets: int
    ) -> None:
        """Sanity-check a bucket layout against the modulus about to be
        PINNED for it (adoption of a pre-manifest table, or pinning a
        None-count manifest): every observed bucket id must be under the
        modulus, and one probe bucket's rows must re-hash to their
        bucket id.  Catches adopting a custom-modulus layout without
        re-passing its n_buckets — which would otherwise hash later
        batches to different buckets than the stored rows and silently
        break last-write-wins."""
        ids = sorted((int(b) for b, fs in buckets.items() if fs))
        if not ids:
            return
        if ids[-1] >= n_buckets:
            raise ValueError(
                f"adopting '{table}': directory has bucket ids up to {ids[-1]}, "
                f"inconsistent with n_buckets={n_buckets} — pass the layout's "
                f"actual n_buckets explicitly"
            )
        probe = ids[0]
        fs = [
            str(self.root / table / f"_kb={probe}" / fn)
            for fn in buckets[str(probe)]
        ]
        bad = (
            self.spark.read.parquet(*fs)
            .where(self._key_bucket(table, n_buckets) != F.lit(probe))
            .limit(1)
            .count()
        )
        if bad:
            raise ValueError(
                f"adopting '{table}': rows in bucket {probe} do not hash to "
                f"{probe} under n_buckets={n_buckets} — the layout was written "
                f"with a different modulus; pass its actual n_buckets"
            )

    @staticmethod
    def _schema_of(m: dict):
        """The StructType a manifest pins (schema evolution), or None —
        readers pass it explicitly so files written BEFORE a column was
        added read back with typed nulls for it (parquet's
        missing-column semantics under a user schema), with no
        mergeSchema footer sweep at read time."""
        from pyspark.sql.types import StructType

        sj = m.get("schema")
        return StructType.fromJson(json.loads(sj)) if sj else None

    def table_schema(self, table: str):
        """The table's CURRENT LOGICAL StructType, or None if unknowable
        — the manifest-pinned evolved schema (with column-mapping
        renames applied) when one exists, else the model's registered
        schema.  Metadata only (no file reads); CLI predicate typing and
        external tooling use this to build correctly-typed literals so
        pruning guards (_key_typed, _same_type_class) engage instead of
        falling back to unprunable cross-type predicates."""
        from pyspark.sql.types import StructField, StructType

        mvs = self._manifest_versions(table)
        if mvs:
            m = self._manifest(table, mvs[-1])
            schema = self._schema_of(m)
            if schema is not None:
                cm = self._colmap_of(m)
                return StructType(
                    [
                        StructField(cm.get(f.name, f.name), f.dataType, f.nullable)
                        for f in schema.fields
                    ]
                )
        if table in ALL_TABLES:
            return ALL_TABLES[table][0]
        return None

    # ------------------------------------------------ column mapping
    #
    # Delta-style COLUMN MAPPING: the manifest's pinned schema is the
    # table's PHYSICAL truth (the names/types actually addressed in
    # parquet footers, zone maps, blooms, bucket keys); an optional
    # ``colmap`` {physical: logical} overlays user-visible RENAMES.
    # Rename is a pure metadata commit; DROP removes the field from the
    # pinned schema (files keep the bytes, every reader pins the schema
    # so the column simply stops being read — time travel still sees
    # it); WIDEN changes the pinned type to a lossless supertype
    # (int→long, int→double, float→double — Spark's parquet readers
    # promote narrow files natively, so zero files rewrite).  Old
    # versions carry their own schema+colmap: time travel shows old
    # names, old types, dropped columns.

    @staticmethod
    def _colmap_of(m: dict | None) -> dict[str, str]:
        """{physical: logical} renames a manifest carries (possibly {})."""
        return (m or {}).get("colmap") or {}

    def _to_logical(self, df: DataFrame, m: dict | None) -> DataFrame:
        """Physical frame → logical names (renames only; drops/widens
        already live in the pinned schema).  Identity when unmapped."""
        cm = self._colmap_of(m)
        if not cm:
            return df
        return df.select(
            *[
                F.col(c).alias(cm[c]) if c in cm else F.col(c)
                for c in df.columns
            ]
        )

    def _to_physical_df(self, df: DataFrame, m: dict | None) -> DataFrame:
        """Logical frame (a user batch) → physical names for staging.
        A batch still naming a RETIRED column (the physical name of a
        renamed column) raises — silently accepting it would let stale
        writers keep using the old name forever, because physical names
        never change."""
        cm = self._colmap_of(m)
        if not cm:
            return df
        inv = {v: k for k, v in cm.items()}
        retired = sorted(
            c for c in df.columns if c in cm and cm[c] != c and c not in inv
        )
        if retired:
            raise ValueError(
                f"batch names renamed-away columns {retired} — use the "
                f"current names {[cm[c] for c in retired]}"
            )
        return df.select(
            *[
                F.col(c).alias(inv[c]) if c in inv else F.col(c)
                for c in df.columns
            ]
        )

    def _preds_physical(self, preds: list, m: dict | None) -> list:
        """Scan/delete predicates arrive over LOGICAL names; the whole
        skipping stack (zone maps, blooms, bucket hash) speaks physical."""
        cm = self._colmap_of(m)
        if not cm:
            return preds
        inv = {v: k for k, v in cm.items()}
        return [(inv.get(c, c), op, val) for c, op, val in preds]

    def _newest_manifest(self, table: str) -> dict | None:
        mvs = self._manifest_versions(table)
        return self._manifest(table, mvs[-1]) if mvs else None

    def _pinned_physical(self, table: str, m: dict):
        """The manifest's pinned physical schema, materializing the
        registered one on first mapping DDL (mapping needs an explicit
        schema to rewrite)."""
        schema = self._schema_of(m)
        if schema is None:
            if table not in ALL_TABLES:
                raise ValueError(
                    f"table '{table}' has no pinned or registered schema — "
                    f"column mapping needs one"
                )
            schema = ALL_TABLES[table][0]
        return schema

    def _mapping_commit(
        self, table: str, m: dict, schema, cm: dict[str, str]
    ) -> int:
        """Publish a METADATA-ONLY commit: same files, new pinned
        schema / colmap.  Zero data bytes move — the certifier asserts
        this via the manifest byte map."""
        return self._commit_manifest(
            table,
            m.get("buckets"),
            m.get("n_buckets"),
            files=m.get("files"),
            base_version=m["version"],
            schema_json=schema.json(),
            colmap={k: v for k, v in cm.items() if k != v} or None,
        )

    def rename_column(self, table: str, old: str, new: str) -> int:
        """Rename a column — METADATA ONLY (Delta column mapping).  The
        physical name stays what every existing file stores; readers
        overlay the new logical name; old versions time-travel with the
        old one.  Returns the new version."""
        m = self._newest_manifest(table)
        if m is None:
            raise ValueError(f"table '{table}' has no manifest to rename in")
        schema = self._pinned_physical(table, m)
        cm = dict(self._colmap_of(m))
        logical = {cm.get(f.name, f.name): f.name for f in schema.fields}
        if old not in logical:
            raise ValueError(
                f"table '{table}': no column {old!r} (have {sorted(logical)})"
            )
        if new in logical and logical.get(new) != logical[old]:
            raise ValueError(f"table '{table}': column {new!r} already exists")
        cm[logical[old]] = new
        return self._mapping_commit(table, m, schema, cm)

    def drop_column(self, table: str, name: str) -> int:
        """Drop a column — METADATA ONLY: the field leaves the pinned
        schema, so no reader ever scans it again (parquet's projection
        pushdown means the bytes are never read, not just hidden); old
        versions still carry it.  Merge-key columns refuse (the LWW
        identity must stay addressable)."""
        from pyspark.sql.types import StructType

        m = self._newest_manifest(table)
        if m is None:
            raise ValueError(f"table '{table}' has no manifest to drop from")
        schema = self._pinned_physical(table, m)
        cm = dict(self._colmap_of(m))
        logical = {cm.get(f.name, f.name): f.name for f in schema.fields}
        if name not in logical:
            raise ValueError(f"table '{table}': no column {name!r}")
        phys = logical[name]
        if phys in MERGE_KEYS.get(table, []):
            raise ValueError(
                f"table '{table}': cannot drop merge-key column {name!r}"
            )
        schema = StructType([f for f in schema.fields if f.name != phys])
        cm.pop(phys, None)
        return self._mapping_commit(table, m, schema, cm)

    #: lossless widening lattice (Delta's type widening): every pair the
    #: parquet readers promote natively, so existing files never rewrite
    _WIDEN_OK = {  # simpleString spellings
        ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
        ("smallint", "int"), ("smallint", "bigint"), ("int", "bigint"),
        ("tinyint", "double"), ("smallint", "double"), ("int", "double"),
        ("float", "double"),
    }

    def widen_column(self, table: str, name: str, new_type: str) -> int:
        """Widen a column's type — METADATA ONLY.  Allowed pairs are the
        lossless promotions Spark's parquet readers perform on narrow
        files under a wide pinned schema (int→long, int→double,
        float→double, …); anything lossy (long→int, long→double past
        2^53, string casts) raises.  New files write the wide type; old
        files promote at scan time; old versions time-travel narrow."""
        from pyspark.sql.types import StructField, StructType, _parse_datatype_string

        m = self._newest_manifest(table)
        if m is None:
            raise ValueError(f"table '{table}' has no manifest to widen in")
        schema = self._pinned_physical(table, m)
        cm = dict(self._colmap_of(m))
        logical = {cm.get(f.name, f.name): f.name for f in schema.fields}
        if name not in logical:
            raise ValueError(f"table '{table}': no column {name!r}")
        phys = logical[name]
        if phys in MERGE_KEYS.get(table, []):
            # xxhash64 is type-sensitive: old rows bucketed as the
            # narrow type would stop colocating with new wide-typed
            # rows of the SAME key — widening a key needs a rebucket,
            # not a metadata commit
            raise ValueError(
                f"table '{table}': cannot widen merge-key column {name!r} "
                f"(bucket hashes are type-sensitive; rebucket instead)"
            )
        tgt = _parse_datatype_string(new_type)
        fields = []
        for f in schema.fields:
            if f.name == phys:
                pair = (f.dataType.simpleString(), tgt.simpleString())
                if pair[0] == pair[1]:
                    return m["version"]  # already there: no-op
                if pair not in self._WIDEN_OK:
                    raise ValueError(
                        f"table '{table}': {pair[0]} → {pair[1]} is not a "
                        f"lossless widening (allowed: {sorted(self._WIDEN_OK)})"
                    )
                fields.append(StructField(phys, tgt, f.nullable))
            else:
                fields.append(f)
        return self._mapping_commit(table, m, StructType(fields), cm)

    def _read_manifest(self, table: str, version: int) -> DataFrame:
        """Read exactly the files a manifest lists. Bucketed manifests
        come back WITH the inferred ``_kb`` partition column — internal
        callers prune/repartition on it; :meth:`read` drops it. Flat
        manifests read their root files directly.  A manifest carrying
        an evolved schema pins it on the reader (older files' missing
        columns read as nulls; Spark appends the ``_kb`` partition
        column on top)."""
        m = self._manifest(table, version)
        base = self.root / table
        schema = self._schema_of(m)
        if "buckets" in m:
            files = [
                str(base / f"_kb={b}" / fn)
                for b, fns in m["buckets"].items()
                for fn in fns
            ]
        else:
            files = [str(base / fn) for fn in m["files"]]
        if not files:
            if schema is not None:
                empty = self.spark.createDataFrame([], schema)
            elif table in ALL_TABLES:
                empty = self.spark.createDataFrame([], ALL_TABLES[table][0])
            else:
                empty = self.spark.read.parquet(str(base)).limit(0).drop("_kb")
            if "buckets" in m:
                empty = empty.withColumn("_kb", F.lit(None).cast("int"))
            return empty
        if "buckets" in m:
            pairs = [
                (f"{b}/{fn}", str(base / f"_kb={b}" / fn))
                for b, fns in m["buckets"].items()
                for fn in fns
            ]
        else:
            pairs = [(fn, str(base / fn)) for fn in m["files"]]
        return self._read_files_dv(table, m, pairs)

    def _dv_dir(self, table: str) -> Path:
        return self.root / "_dvs" / table

    def _read_files_dv(
        self, table: str, m: dict, pairs: list[tuple[str, str]], *, schema="__manifest__"
    ) -> DataFrame:
        """Read manifest-listed files with the manifest's DELETION
        VECTORS applied (merge-on-read).  ``pairs`` is [(rel, abs
        path)]; files WITHOUT a DV entry read straight through (the
        overwhelmingly common case — zero overhead), files WITH one
        read alongside ``_metadata.row_index`` and anti-join their
        recorded (rel, pos) tombstones.  The DV side is usually a few
        KB of positions, so Catalyst broadcasts the anti-join; a file's
        physical row order is immutable (parquet), which is what makes
        positions a stable row identity.  Bucketed reads keep the
        ``_kb`` partition column, exactly like the raw reader."""
        base = self.root / table
        bucketed = "buckets" in m
        sch = self._schema_of(m) if schema == "__manifest__" else schema
        rdr = self.spark.read if sch is None else self.spark.read.schema(sch)

        def _rd(files: list[str]) -> DataFrame:
            if bucketed:
                return rdr.option("basePath", str(base)).parquet(*files)
            return rdr.parquet(*files)

        dvs = m.get("dvs", {})
        dv_pairs = [(r, p) for r, p in pairs if r in dvs]
        if not dv_pairs:
            return _rd([p for _r, p in pairs])
        clean = [p for r, p in pairs if r not in dvs]
        fp = F.col("_metadata.file_path")
        if bucketed:
            pat = r"_kb=(\d+)/([^/]+)$"
            rel_expr = F.concat(
                F.regexp_extract(fp, pat, 1),
                F.lit("/"),
                F.regexp_extract(fp, pat, 2),
            )
        else:
            rel_expr = F.element_at(F.split(fp, "/"), -1)
        df = _rd([p for _r, p in dv_pairs]).select(
            "*",
            rel_expr.alias("__dv_rel"),
            F.col("_metadata.row_index").alias("__dv_pos"),
        )
        names = sorted({n for r, _p in dv_pairs for n in dvs[r]})
        pos = (
            self.spark.read.schema("rel string, pos long")
            .parquet(*[str(self._dv_dir(table) / n) for n in names])
            .select(
                F.col("rel").alias("__dv_rel"), F.col("pos").alias("__dv_pos")
            )
        )
        df = df.join(pos, ["__dv_rel", "__dv_pos"], "left_anti").drop(
            "__dv_rel", "__dv_pos"
        )
        if clean:
            df = _rd(clean).unionByName(df)
        return df

    def _live_bucket_files(self, table: str) -> dict[str, list[str]]:
        """Live bucket→file map (manifest if present, else directory).
        A flat-manifest table reports its root files under the '' key."""
        mvs = self._manifest_versions(table)
        if mvs:
            m = self._manifest(table, mvs[-1])
            return m["buckets"] if "buckets" in m else {"": m["files"]}
        return self._dir_buckets(table)

    # --------------------------------------------------------- file staging
    def _stage_flat(
        self, table: str, df: DataFrame, *, key_shuffle: bool = True
    ) -> tuple[list[str], dict[str, int]]:
        """Write ``df`` as new immutable files at the table root (via a
        staging dir — parquet can't overwrite in place while reading);
        returns (new file names, name→bytes) for the manifest. Nothing
        live is touched: the commit point is the manifest publish.
        ``key_shuffle`` hash-distributes on the merge key so later
        joins/merges co-locate; callers that pre-shaped the partitioning
        (compaction's target file count) pass False.

        The staging dir is unique per WRITER (uuid suffix): concurrent
        commits to one table must not clobber each other's staged files
        — the commit loop serializes only the manifest publish."""
        keys = MERGE_KEYS.get(table)
        staging = self.root / f"_{table}_staging_{uuid.uuid4().hex[:12]}"
        part = df.repartition(*keys) if (key_shuffle and keys) else df
        part.write.mode("overwrite").parquet(str(staging))
        path = self.root / table
        path.mkdir(parents=True, exist_ok=True)
        names: list[str] = []
        sizes: dict[str, int] = {}
        for f in sorted(staging.glob("part-*")):
            sizes[f.name] = f.stat().st_size
            f.rename(path / f.name)  # unique (job-UUID) names: no clash
            names.append(f.name)
        shutil.rmtree(staging, ignore_errors=True)
        return names, sizes

    def _stage_bucketed(
        self, table: str, df: DataFrame
    ) -> tuple[dict[str, list[str]], dict[str, int]]:
        """Write a ``_kb``-partitioned ``df`` as new immutable files
        under the table's bucket dirs; returns (the fresh bucket→file
        map — ONLY the staged buckets, callers overlay or replace —
        and the "b/fn"→bytes size map).

        Repartition BY BUCKET, not by key: partitionBy alone would emit
        one file per (shuffle task × bucket) — 32×512 tiny files on a
        full write. One task per bucket → one file per bucket; key
        co-location holds at bucket granularity (the bucket is a
        function of the key).

        The staging dir is unique per WRITER (uuid suffix): concurrent
        commits to one table must not clobber each other's staged files
        — the commit loop serializes only the manifest publish."""
        staging = self.root / f"_{table}_inc_staging_{uuid.uuid4().hex[:12]}"
        df.repartition(F.col("_kb")).write.partitionBy("_kb").mode(
            "overwrite"
        ).parquet(str(staging))
        path = self.root / table
        new_buckets: dict[str, list[str]] = {}
        sizes: dict[str, int] = {}
        for src in sorted(staging.glob("_kb=*")):
            b = src.name.split("=", 1)[1]
            dst = path / src.name
            dst.mkdir(parents=True, exist_ok=True)
            names: list[str] = []
            for f in sorted(src.glob("part-*")):
                sizes[f"{b}/{f.name}"] = f.stat().st_size
                f.rename(dst / f.name)
                names.append(f.name)
            new_buckets[b] = names
        shutil.rmtree(staging, ignore_errors=True)
        return new_buckets, sizes

    # ---------------------------------------------------- schema evolution
    @staticmethod
    def _align_columns(df: DataFrame, fields) -> DataFrame:
        """Add any of ``fields`` missing from ``df`` as typed nulls and
        project to their order (extra internal columns like ``_kb``/
        ``_seq`` are preserved at the end)."""
        names = [f.name for f in fields]
        extras = [c for c in df.columns if c not in names]
        for f in fields:
            if f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        return df.select(*names, *extras)

    def _resolve_evolution(
        self, table: str, manifest: dict | None, batch_schema, allow_new_columns: bool
    ):
        """Validate a batch's schema against the table's stored one and
        return ``(evolved StructType | None, schema_json_for_commit)``.

        The contract is Delta's: ADDING nullable columns is evolution
        (opt-in via ``allow_new_columns``); a batch MISSING stored
        columns, or changing a column's type, raises — implicit nulls
        and silent casts corrupt last-write-wins rows, so both need an
        explicit migration, not a merge flag."""
        stored = self._schema_of(manifest) if manifest else None
        if stored is None and table in ALL_TABLES:
            stored = ALL_TABLES[table][0]
        if stored is None:
            return None, "__carry__"
        sf = {f.name: f for f in stored.fields}
        bf = {f.name: f for f in batch_schema.fields}
        missing = sorted(set(sf) - set(bf))
        if missing:
            raise ValueError(
                f"table '{table}': batch is missing stored columns {missing} — "
                f"a MERGE row replaces its key's whole row, so absent columns "
                f"would silently null stored values; supply every column"
            )
        changed = sorted(
            n for n in bf if n in sf and bf[n].dataType != sf[n].dataType
        )
        if changed:
            raise ValueError(
                f"table '{table}': batch changes column types for {changed} "
                f"(stored {[sf[n].dataType.simpleString() for n in changed]}, "
                f"batch {[bf[n].dataType.simpleString() for n in changed]}) — "
                f"type changes require an explicit rewrite, not a merge"
            )
        extras = [f for f in batch_schema.fields if f.name not in sf]
        if not extras:
            return stored, "__carry__"
        if not allow_new_columns:
            raise ValueError(
                f"table '{table}': batch adds new columns "
                f"{[f.name for f in extras]} — pass allow_new_columns=True to "
                f"evolve the schema (stored rows read the new columns as null)"
            )
        from pyspark.sql.types import StructType

        evolved = StructType(list(stored.fields) + list(extras))
        return evolved, evolved.json()

    # ------------------------------------------------------ E9/E10 upsert
    def merge_batch(
        self,
        tables: dict[str, DataFrame],
        batch_seq: int = 1,
        *,
        txn: tuple[str, int] | None = None,
        allow_new_columns: bool = False,
    ) -> None:
        """MERGE-upsert a batch into the warehouse: stored rows are seq 0,
        batch rows seq ``batch_seq``; last-write-wins per MERGE key.

        ``txn=(app, version)`` makes the merge EXACTLY-ONCE per writer:
        a table whose manifest already records ``app`` at >= ``version``
        is skipped entirely (see :meth:`_commit_manifest`) — the replay
        contract for streaming foreachBatch sinks and scheduler retries.

        ``allow_new_columns=True`` permits SCHEMA EVOLUTION: batch
        columns the table lacks are added (stored rows read them as
        nulls; the manifest pins the evolved schema, old files are
        never rewritten).  Missing columns and type changes raise
        either way — see :meth:`_resolve_evolution`.

        At scale the window dedup shuffles on the merge key once — the
        same shuffle MERGE INTO would need; no driver-side loop — but
        the COMMIT is a whole-table rewrite: O(table) per batch. Use
        :meth:`merge_batch_incremental` for repeated merges at scale.

        Flat tables only: a table converted to the bucketed layout
        rejects the whole-table-rewrite path loudly instead of mangling
        the partitioned layout."""
        for name, df in tables.items():
            if name not in MERGE_KEYS:
                continue
            if txn is not None:
                seen = self.last_txn_version(name, txn[0])
                if seen is not None and seen >= txn[1]:
                    continue  # replay: committed before, skip the work too
            keys = MERGE_KEYS[name]
            path = Path(self._path(name))
            mvs = self._manifest_versions(name)
            newest = self._manifest(name, mvs[-1]) if mvs else None
            if (newest is not None and "buckets" in newest) or any(
                path.glob("_kb=*")
            ):
                raise ValueError(
                    f"table '{name}' is bucket-partitioned (incremental layout); "
                    f"use merge_batch_incremental for it"
                )
            if newest is None and path.exists():
                v = self._adopt_flat(name)
                newest = self._manifest(name, v)
            # column mapping: user batches arrive with LOGICAL names;
            # storage (schema pin, bucket hash, staging) speaks physical
            df = self._to_physical_df(df, newest)
            evolved, sj = self._resolve_evolution(
                name, newest, df.schema, allow_new_columns
            )
            if evolved is not None:
                df = self._align_columns(df, evolved.fields)
            if newest is not None:
                stored = self._read_manifest(name, newest["version"])
                if evolved is not None:
                    stored = self._align_columns(stored, evolved.fields)
                stored = stored.withColumn("_seq", F.lit(0))
                merged = stored.unionByName(df.withColumn("_seq", F.lit(batch_seq)))
                w = Window.partitionBy(*keys).orderBy(F.desc("_seq"))
                merged = (
                    merged.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn", "_seq")
                )
                base = newest["version"]
            else:
                merged = df.dropDuplicates(keys)
                base = -1  # brand-new table: any concurrent creator conflicts
            names, fb = self._stage_flat(name, merged)
            try:
                self._commit_manifest(
                    name,
                    files=names,
                    base_version=base,
                    file_bytes=fb,
                    txn=txn,
                    schema_json=sj,
                )
            except IdempotentReplay:
                # lost-ack race: a twin writer committed this (app,
                # version) between our pre-check and publish; the staged
                # files are orphans for vacuum
                continue

    # -------------------------------------------- incremental MERGE
    #: key-bucket count for incrementally merged tables; at 100 TB this
    #: is a per-table knob sized so one bucket ≈ a few target files.
    #: The count is PINNED in the table's manifest at conversion time —
    #: a later commit with a different count raises (a silent modulus
    #: change would scatter each key across two buckets and break LWW);
    #: :meth:`rebucket` is the sanctioned re-layout.
    N_KEY_BUCKETS = 64

    def merge_batch_incremental(
        self,
        tables: dict[str, DataFrame],
        batch_seq: int = 1,
        *,
        n_buckets: int | None = None,
        txn: tuple[str, int] | None = None,
        allow_new_columns: bool = False,
    ) -> dict[str, int]:
        """MERGE-upsert that rewrites ONLY the key-buckets the batch
        touches — the scale fix for :meth:`merge_batch`, whose
        whole-table rewrite makes a stream of small commits O(table)
        EACH (quadratic total at 100 TB).  Layout: the table is
        hive-partitioned by ``_kb = pmod(xxhash64(keys), n_buckets)``;
        a commit computes the batch's bucket set, reads back ONLY the
        touched buckets' live files (manifest-level pruning — stricter
        than partition pruning: untouched buckets' files are never even
        LISTED), applies the same last-write-wins window as merge_batch,
        writes the merged buckets as NEW immutable files, and publishes
        a manifest whose atomic create-if-absent is the commit (module
        docstring: the object-store-safe protocol).  Untouched buckets'
        files are never opened, rewritten, or moved — old and new
        versions share them, which is also what makes every commit a
        time-travelable version for free.  Concurrent commits touching
        DISJOINT bucket sets are serialized by the commit loop's rebase;
        overlapping ones raise :class:`ConcurrentCommitError`.

        Cost per commit: O(|batch| + |touched buckets|) — with B
        buckets and a batch touching k keys, at most min(k, B)/B of the
        table is rewritten.  Returns {table: n_touched_buckets}.

        The dedup invariant is enforced per bucket, which is equivalent
        to global LWW because the bucket is a FUNCTION of the merge
        key: a key's every version lands in the same bucket.

        ``txn=(app, version)`` makes the merge EXACTLY-ONCE per writer
        (see :meth:`merge_batch`): replayed tables are skipped with
        zero writes and omitted from the returned dict.

        ``allow_new_columns=True`` permits SCHEMA EVOLUTION (see
        :meth:`merge_batch`): the manifest pins the evolved schema;
        untouched buckets' files are NOT rewritten — their rows read
        the new columns as typed nulls through the pinned schema."""
        out: dict[str, int] = {}
        for name, df in tables.items():
            if name not in MERGE_KEYS:
                continue
            if txn is not None:
                seen = self.last_txn_version(name, txn[0])
                if seen is not None and seen >= txn[1]:
                    continue  # replay: committed before, skip the work too
            keys = MERGE_KEYS[name]
            path = Path(self._path(name))
            mvs = self._manifest_versions(name)
            newest = self._manifest(name, mvs[-1]) if mvs else None
            if newest is None and path.exists() and any(path.glob("_kb=*")):
                # adopt a pre-manifest bucketed table: snapshot the current
                # directory state as its first manifest (bucket count
                # pinned from this call onward, after validating it
                # against the layout's observed bucket ids + a one-bucket
                # re-hash probe)
                nb0 = n_buckets or self.N_KEY_BUCKETS
                dirb = self._dir_buckets(name)
                self._validate_bucket_modulus(name, dirb, nb0)
                v = self._commit_manifest(name, dirb, nb0)
                newest = self._manifest(name, v)
            if newest is None and path.exists():
                # legacy flat dir: adopt it first so the pre-conversion
                # state stays a readable version
                v = self._adopt_flat(name)
                newest = self._manifest(name, v)
            prev = newest if (newest is not None and "buckets" in newest) else None
            if prev is not None:
                if n_buckets is not None and prev["n_buckets"] is not None and n_buckets != prev["n_buckets"]:
                    raise ValueError(
                        f"table '{name}' is laid out with n_buckets="
                        f"{prev['n_buckets']}; got n_buckets={n_buckets} — a "
                        f"modulus change scatters keys across buckets and "
                        f"breaks the MERGE invariant; use rebucket('{name}', "
                        f"{n_buckets}) for the one-time re-layout"
                    )
                if prev["n_buckets"] is not None:
                    nb = prev["n_buckets"]
                else:
                    # a None-count manifest (adopted by optimize):
                    # pinning happens NOW — validate first
                    nb = n_buckets or self.N_KEY_BUCKETS
                    self._validate_bucket_modulus(name, prev["buckets"], nb)
            else:
                nb = n_buckets or self.N_KEY_BUCKETS
            # column mapping: user batches arrive with LOGICAL names;
            # storage (schema pin, bucket hash, staging) speaks physical
            df = self._to_physical_df(df, newest)
            evolved, sj = self._resolve_evolution(
                name, newest, df.schema, allow_new_columns
            )
            if evolved is not None:
                df = self._align_columns(df, evolved.fields)
            batch = df.withColumn("_kb", self._key_bucket(name, nb))
            if prev is None:
                # conversion from a flat table (or first commit of a new
                # one): full bucketed write — the one unavoidable
                # O(table) pass. The flat state's files stay in place,
                # readable through their own manifests until vacuumed.
                base_df = batch
                if newest is not None:
                    stored = self._read_manifest(name, newest["version"])
                    if evolved is not None:
                        stored = self._align_columns(stored, evolved.fields)
                    stored = stored.withColumn(
                        "_kb", self._key_bucket(name, nb)
                    ).withColumn("_seq", F.lit(0))
                    base_df = stored.unionByName(
                        batch.withColumn("_seq", F.lit(batch_seq))
                    )
                    w = Window.partitionBy(*keys).orderBy(F.desc("_seq"))
                    base_df = (
                        base_df.withColumn("_rn", F.row_number().over(w))
                        .filter(F.col("_rn") == 1)
                        .drop("_rn", "_seq")
                    )
                else:
                    base_df = base_df.dropDuplicates(keys)
                new_buckets, fb = self._stage_bucketed(name, base_df)
                try:
                    self._commit_manifest(
                        name,
                        new_buckets,
                        nb,
                        base_version=newest["version"]
                        if newest is not None
                        else (self.versions(name) or [-1])[-1],
                        file_bytes=fb,
                        txn=txn,
                        schema_json=sj,
                    )
                except IdempotentReplay:
                    continue  # lost-ack race; staged files → vacuum
                out[name] = nb
                continue
            # materialize the batch once: it is scanned twice below (the
            # touched-bucket set, then the merge union), and incremental
            # commits assume batch ≪ table — recomputing an expensive
            # upstream pipeline per scan would waste more than the
            # checkpoint costs
            batch = batch.localCheckpoint(eager=True)
            touched = sorted(
                r["_kb"] for r in batch.select("_kb").distinct().collect()
            )  # bounded by n_buckets
            stored_pairs = [
                (f"{b}/{fn}", str(path / f"_kb={b}" / fn))
                for b in touched
                for fn in prev["buckets"].get(str(b), [])
            ]
            if stored_pairs:
                sch = self._schema_of(prev) if evolved is None else evolved
                # manifest-level pruning + DV apply: tombstoned rows in
                # the touched buckets must lose the LWW race and not
                # resurrect in the rewrite
                stored_sub = self._read_files_dv(
                    name, prev, stored_pairs, schema=sch
                ).withColumn("_seq", F.lit(0))
                merged = stored_sub.unionByName(batch.withColumn("_seq", F.lit(batch_seq)))
                w = Window.partitionBy(*keys).orderBy(F.desc("_seq"))
                merged = (
                    merged.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn", "_seq")
                )
            else:
                merged = batch.dropDuplicates(keys)
            staged, fb = self._stage_bucketed(name, merged)
            new_buckets = dict(prev["buckets"])
            for b in touched:
                # [] = the batch emptied the bucket
                new_buckets[str(b)] = staged.get(str(b), [])
            try:
                self._commit_manifest(
                    name,
                    new_buckets,
                    nb,
                    base_version=prev["version"],
                    touched={str(b) for b in touched},
                    file_bytes=fb,
                    txn=txn,
                    schema_json=sj,
                )
            except IdempotentReplay:
                continue  # lost-ack race; staged files → vacuum
            out[name] = len(touched)
        return out

    def merge_into(
        self,
        table: str,
        source: DataFrame,
        *,
        when_matched_update: dict | str | None = None,
        when_matched_condition: Column | None = None,
        when_matched_delete: Column | bool | None = None,
        when_not_matched_insert: bool = True,
        when_not_matched_by_source_delete: Column | bool | None = None,
        when_not_matched_by_source_update: dict | None = None,
        when_not_matched_by_source_condition: Column | None = None,
        strategy: str = "mor",
        txn: tuple[str, int] | None = None,
    ) -> dict:
        """Delta's three-arm **MERGE INTO** on this manifest: join the
        target with ``source`` on the table's merge keys, then per row

        - MATCHED & ``when_matched_delete`` (a Column over the joined
          aliases, or True) → the target row is DELETED;
        - MATCHED & ``when_matched_update`` (and, if given,
          ``when_matched_condition``) → the listed columns are
          reassigned — values may be literals or Column expressions
          over the aliases ``t`` (target) and ``s`` (source), e.g.
          ``{"size": F.col("t.size") + F.col("s.size")}``; the string
          ``"all"`` takes every source column;
        - MATCHED otherwise → carried unchanged;
        - NOT MATCHED (source-only) & ``when_not_matched_insert`` →
          INSERTED (target columns the source lacks become NULL);
        - NOT MATCHED BY SOURCE (target-only; Delta's fourth arm) &
          ``when_not_matched_by_source_delete`` (Column over ``t``, or
          True) → DELETED; else &
          ``when_not_matched_by_source_update`` (+ optional
          ``when_not_matched_by_source_condition``) → reassigned —
          values are literals or Columns over ``t`` only (there is no
          source row).  The full-sync idiom: a by-source arm makes the
          merge read the WHOLE target (every row must learn its fate),
          so it costs O(table) by definition — without one, only
          source-touched buckets are read;
        - target-only rows are otherwise always carried.

        Delta's multiple-source-rows error is enforced: a source with
        duplicate merge keys raises (the update would be ambiguous).

        Scale shape: on a bucketed table only the buckets the SOURCE
        touches are read (DV-applied) — one full-outer join per
        touched-bucket subset, one manifest commit with disjoint-bucket
        rebase.  The WRITE path is chosen by ``strategy``:

        - ``"mor"`` (default, Delta's DV merge): matched update/delete
          rows have their old positions DV-TOMBSTONED into one sidecar
          and the update/insert images are APPENDED as new files —
          carry rows are never rewritten, so the commit writes
          O(changed rows), not O(touched buckets);
        - ``"cow"``: every touched bucket rewrites in full (flat
          tables rewrite whole-table) — the compacting choice when a
          merge churns most of a bucket anyway.

        Both are observationally identical (the gate certifier asserts
        it).  Column mapping: source and assignments speak LOGICAL
        names.

        Returns ``{'rows_updated', 'rows_deleted', 'rows_inserted',
        'buckets_touched'}`` (buckets_touched None on flat tables)."""
        keys = MERGE_KEYS.get(table)
        if not keys:
            raise ValueError(f"table '{table}' has no merge keys")
        if strategy not in ("mor", "cow"):
            raise ValueError(f"merge_into strategy must be 'mor' or 'cow', got {strategy!r}")
        if (
            when_matched_update is None
            and when_matched_delete is None
            and not when_not_matched_insert
            and when_not_matched_by_source_delete is None
            and when_not_matched_by_source_update is None
        ):
            raise ValueError("merge_into with no arms is a no-op — say so explicitly")
        by_source = (
            when_not_matched_by_source_delete is not None
            or when_not_matched_by_source_update is not None
        )
        if txn is not None:
            seen = self.last_txn_version(table, txn[0])
            if seen is not None and seen >= txn[1]:
                return {
                    "rows_updated": 0, "rows_deleted": 0,
                    "rows_inserted": 0, "buckets_touched": 0,
                }
        mvs = self._manifest_versions(table)
        if not mvs:
            if any((self.root / table).glob("_kb=*")):
                dirb = self._dir_buckets(table)
                self._validate_bucket_modulus(table, dirb, self.N_KEY_BUCKETS)
                self._commit_manifest(table, dirb, self.N_KEY_BUCKETS)
            else:
                self._adopt_flat(table)
            mvs = self._manifest_versions(table)
        m = self._manifest(table, mvs[-1])
        bucketed = "buckets" in m
        schema = self._schema_of(m)
        if schema is None and table in ALL_TABLES:
            schema = ALL_TABLES[table][0]
        types = {f.name: f.dataType for f in schema.fields}
        cm = self._colmap_of(m)
        logical_names = [cm.get(f.name, f.name) for f in schema.fields]
        lkeys = [cm.get(k, k) for k in keys]

        src = self._to_physical_df(source, m)
        missing_keys = [k for k in keys if k not in src.columns]
        if missing_keys:
            raise ValueError(
                f"merge_into source must carry the merge keys; missing "
                f"{[cm.get(k, k) for k in missing_keys]}"
            )
        src = src.localCheckpoint(eager=True)
        dup = src.groupBy(*keys).count().filter(F.col("count") > 1).limit(1)
        if not dup.isEmpty():
            raise ValueError(
                "merge_into source has duplicate merge keys — multiple "
                "source rows match one target row (Delta's ambiguity error)"
            )

        # target subset: touched buckets only (bucketed), else whole
        # table — read WITH durable (file, row_index) identity so the
        # MOR write path can tombstone exactly the rows its arms kill
        if bucketed:
            if by_source:
                # a by-source arm must see EVERY target row: whole table
                touched = sorted(int(b) for b in m["buckets"])
            else:
                kb = src.withColumn(
                    "_kb", self._key_bucket(table, m["n_buckets"])
                )
                touched = sorted(
                    r["_kb"] for r in kb.select("_kb").distinct().collect()
                )
            pairs = [
                (f"{b}/{fn}", str(self.root / table / f"_kb={b}" / fn))
                for b in touched
                for fn in m["buckets"].get(str(b), [])
            ]
        else:
            touched = None
            pairs = [
                (fn, str(self.root / table / fn))
                for fn in m.get("files", [])
            ]
        if pairs:
            stored = self._read_files_pos(table, m, pairs)
            if bucketed:
                stored = stored.drop("_kb")
        else:
            stored = self.spark.createDataFrame([], schema).select(
                "*",
                F.lit(None).cast("string").alias("__rel"),
                F.lit(None).cast("long").alias("__pos"),
            )
        # merge logic runs in LOGICAL space over aliases t / s.  Side
        # PRESENCE is tagged with marker columns before the join — NOT
        # inferred from key nullness: a target row whose key column is
        # NULL never key-matches, but it still exists and must be
        # carried, not misread as source-only.
        t = (
            self._to_logical(stored, m)
            .withColumn("_m_t_present", F.lit(True))
            .alias("t")
        )
        s = (
            self._to_logical(src, m)
            .withColumn("_m_s_present", F.lit(True))
            .alias("s")
        )
        joined = t.join(s, [F.col(f"t.{k}") == F.col(f"s.{k}") for k in lkeys], "full_outer")
        t_present = F.col("t._m_t_present").isNotNull()
        s_present = F.col("s._m_s_present").isNotNull()
        matched = t_present & s_present
        s_only = ~t_present

        if when_matched_update == "all":
            when_matched_update = {
                cm.get(c, c): F.col(f"s.{cm.get(c, c)}")
                for c in src.columns
                if c in types and c not in keys
            }
        upd = {}
        for col, val in (when_matched_update or {}).items():
            if col in lkeys:
                raise ValueError(f"merge_into cannot update merge-key column {col!r}")
            if col not in logical_names:
                raise ValueError(f"table '{table}' has no column {col!r}")
            upd[col] = val if hasattr(val, "cast") else F.lit(val)
        # Same typed-assignment guard as update_where: mistyped update
        # or insert values raise instead of ANSI-off silently casting to
        # NULL.  Update RHS types resolve over the joined aliases (they
        # may reference t/s); insert types are the source's own columns.
        phys0 = {v: k for k, v in cm.items()}
        if upd:
            resolved_u = {
                f.name: f.dataType
                for f in joined.select(
                    *[c.alias(n) for n, c in upd.items()]
                ).schema.fields
            }
            bad = sorted(
                n
                for n in upd
                if not _assignable_type(resolved_u[n], types[phys0.get(n, n)])
            )
            if bad:
                raise ValueError(
                    f"table '{table}': MERGE update changes column types for "
                    f"{bad} (stored "
                    f"{[types[phys0.get(n, n)].simpleString() for n in bad]}, "
                    f"assigned {[resolved_u[n].simpleString() for n in bad]}) — "
                    f"type changes require an explicit rewrite"
                )
        if when_not_matched_insert:
            src_types = {f.name: f.dataType for f in src.schema.fields}
            bad = sorted(
                cm.get(c, c)
                for c in src.columns
                if c in types and not _assignable_type(src_types[c], types[c])
            )
            if bad:
                raise ValueError(
                    f"table '{table}': MERGE insert source column types "
                    f"disagree with stored types for {bad} — cast the source "
                    f"explicitly"
                )
        # by-source arms (Delta's WHEN NOT MATCHED BY SOURCE): values
        # and conditions speak the t alias only — there is no source row
        bs_upd = {}
        for col, val in (when_not_matched_by_source_update or {}).items():
            if col in lkeys:
                raise ValueError(f"merge_into cannot update merge-key column {col!r}")
            if col not in logical_names:
                raise ValueError(f"table '{table}' has no column {col!r}")
            bs_upd[col] = val if hasattr(val, "cast") else F.lit(val)
        if bs_upd:
            resolved_b = {
                f.name: f.dataType
                for f in joined.select(
                    *[c.alias(n) for n, c in bs_upd.items()]
                ).schema.fields
            }
            bad = sorted(
                n
                for n in bs_upd
                if not _assignable_type(resolved_b[n], types[phys0.get(n, n)])
            )
            if bad:
                raise ValueError(
                    f"table '{table}': MERGE by-source update changes column "
                    f"types for {bad} — type changes require an explicit rewrite"
                )
        del_cond = None
        if when_matched_delete is True:
            del_cond = F.lit(True)
        elif when_matched_delete is not None and when_matched_delete is not False:
            del_cond = when_matched_delete
        upd_cond = (
            when_matched_condition if when_matched_condition is not None else F.lit(True)
        )
        bs_del_cond = None
        if when_not_matched_by_source_delete is True:
            bs_del_cond = F.lit(True)
        elif (
            when_not_matched_by_source_delete is not None
            and when_not_matched_by_source_delete is not False
        ):
            bs_del_cond = when_not_matched_by_source_delete
        bs_upd_cond = (
            when_not_matched_by_source_condition
            if when_not_matched_by_source_condition is not None
            else F.lit(True)
        )
        t_only = t_present & ~s_present

        outcome = F.when(matched & (del_cond if del_cond is not None else F.lit(False)), "delete")
        if upd:
            outcome = outcome.when(matched & upd_cond, "update")
        outcome = outcome.when(matched, "carry")
        if when_not_matched_insert:
            outcome = outcome.when(s_only, "insert")
        if bs_del_cond is not None:
            outcome = outcome.when(t_only & bs_del_cond, "delete")
        if bs_upd:
            outcome = outcome.when(t_only & bs_upd_cond, "update_bs")
        outcome = outcome.otherwise(F.when(s_only, "skip").otherwise("carry"))

        phys = {v: k for k, v in cm.items()}

        def _out_col(lname: str) -> Column:
            tcol, scol = F.col(f"t.{lname}"), None
            if phys.get(lname, lname) in src.columns:
                scol = F.col(f"s.{lname}")
            c = F.when(F.col("_m_outcome") == "update", upd.get(lname, tcol))
            if bs_upd:
                c = c.when(
                    F.col("_m_outcome") == "update_bs", bs_upd.get(lname, tcol)
                )
            if when_not_matched_insert:
                c = c.when(
                    F.col("_m_outcome") == "insert",
                    scol if scol is not None else F.lit(None),
                )
            c = c.otherwise(tcol)
            return c.cast(types[phys.get(lname, lname)]).alias(lname)

        tagged = joined.withColumn("_m_outcome", outcome)
        tagged = tagged.localCheckpoint(eager=True)
        counts = {
            r["_m_outcome"]: r["n"]
            for r in tagged.groupBy("_m_outcome")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if strategy == "mor":
            # merge-on-read: tombstone the positions the matched arms
            # kill, append only the update/insert images — carry rows
            # stay in their files untouched
            tomb = (
                tagged.filter(
                    F.col("_m_outcome").isin("update", "delete", "update_bs")
                )
                .select(
                    F.col("t.__rel").alias("__rel"),
                    F.col("t.__pos").alias("__pos"),
                )
                .localCheckpoint(eager=True)
            )
            n_dead = tomb.count()
            n_new = (
                int(counts.get("update", 0))
                + int(counts.get("insert", 0))
                + int(counts.get("update_bs", 0))
            )
            images = self._to_physical_df(
                tagged.filter(
                    F.col("_m_outcome").isin("update", "insert", "update_bs")
                )
                .select(*[_out_col(n) for n in logical_names]),
                m,
            )
            dv_name = None
            file_dvs = None
            if n_dead:
                dv_name, _dvb = self._write_dv_sidecar(table, tomb)
                affected = sorted(
                    r["__rel"] for r in tomb.select("__rel").distinct().collect()
                )  # bounded by the touched buckets' file count
                dvs0 = m.get("dvs", {})
                file_dvs = {
                    rel: dvs0.get(rel, []) + [dv_name] for rel in affected
                }
            try:
                if bucketed:
                    new_buckets = dict(m["buckets"])
                    fb: dict[str, int] = {}
                    touched_commit = {
                        rel.split("/", 1)[0] for rel in (file_dvs or {})
                    }
                    if n_new:
                        out_df = images.withColumn(
                            "_kb", self._key_bucket(table, m["n_buckets"])
                        )
                        staged, fb = self._stage_bucketed(table, out_df)
                        for b, fresh in staged.items():
                            new_buckets[str(b)] = (
                                list(new_buckets.get(str(b), [])) + fresh
                            )
                            touched_commit.add(str(b))
                    self._commit_manifest(
                        table,
                        new_buckets,
                        m["n_buckets"],
                        base_version=m["version"],
                        touched=touched_commit,
                        file_bytes=fb,
                        file_dvs=file_dvs,
                        txn=txn,
                    )
                else:
                    names: list[str] = []
                    fb = {}
                    if n_new:
                        names, fb = self._stage_flat(
                            table, images.coalesce(1), key_shuffle=False
                        )
                    self._commit_manifest(
                        table,
                        files=list(m.get("files", [])) + names,
                        base_version=m["version"],
                        file_bytes=fb,
                        file_dvs=file_dvs,
                        txn=txn,
                    )
            except IdempotentReplay:
                if dv_name is not None:
                    (self._dv_dir(table) / dv_name).unlink(missing_ok=True)
                return {
                    "rows_updated": 0, "rows_deleted": 0,
                    "rows_inserted": 0, "buckets_touched": 0,
                }
            return {
                "rows_updated": int(counts.get("update", 0))
                + int(counts.get("update_bs", 0)),
                "rows_deleted": int(counts.get("delete", 0)),
                "rows_inserted": int(counts.get("insert", 0)),
                "buckets_touched": len(touched) if touched is not None else None,
            }
        result = (
            tagged.filter(~F.col("_m_outcome").isin("delete", "skip"))
            .select(*[_out_col(n) for n in logical_names])
        )
        result = self._to_physical_df(result, m)
        try:
            if bucketed:
                out_df = result.withColumn(
                    "_kb", self._key_bucket(table, m["n_buckets"])
                )
                staged, fb = self._stage_bucketed(table, out_df)
                new_buckets = dict(m["buckets"])
                for b in touched:
                    new_buckets[str(b)] = staged.get(str(b), staged.get(b, []))
                self._commit_manifest(
                    table,
                    new_buckets,
                    m["n_buckets"],
                    base_version=m["version"],
                    touched={str(b) for b in touched},
                    file_bytes=fb,
                    txn=txn,
                )
            else:
                names, fb = self._stage_flat(table, result)
                self._commit_manifest(
                    table,
                    files=names,
                    base_version=m["version"],
                    file_bytes=fb,
                    txn=txn,
                )
        except IdempotentReplay:
            return {
                "rows_updated": 0, "rows_deleted": 0,
                "rows_inserted": 0, "buckets_touched": 0,
            }
        return {
            "rows_updated": int(counts.get("update", 0))
            + int(counts.get("update_bs", 0)),
            "rows_deleted": int(counts.get("delete", 0)),
            "rows_inserted": int(counts.get("insert", 0)),
            "buckets_touched": len(touched) if touched is not None else None,
        }

    def rebucket(self, table: str, n_buckets: int) -> int:
        """One-time O(table) re-layout to a new bucket modulus, AS a
        manifest commit — the B ∝ table-size lever (SCALE.md addendum
        42: per-commit write volume is O(|batch| + k·table/B), so the
        bucket count must grow with the table; a table that outgrew its
        birth-time modulus re-layouts here instead of being stuck on
        it).  The table's live content is re-hashed at the new modulus
        and written as new immutable files; ONE manifest commit
        publishes the new layout.  Old versions stay readable — their
        manifests pin their own n_buckets and file lists, so time
        travel (and metadata-only rollback) crosses the rebucket — and
        later incremental commits hash at the new modulus.  Returns the
        new version number."""
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        mvs = self._manifest_versions(table)
        newest = self._manifest(table, mvs[-1]) if mvs else None
        if newest is None or "buckets" not in newest:
            raise ValueError(
                f"rebucket requires a bucket-partitioned table; '{table}' is "
                f"flat — convert it with merge_batch_incremental first"
            )
        if newest["n_buckets"] == n_buckets:
            return newest["version"]
        df = (
            self._read_manifest(table, newest["version"])
            .drop("_kb")
            .withColumn("_kb", self._key_bucket(table, n_buckets))
        )
        new_buckets, fb = self._stage_bucketed(table, df)
        return self._commit_manifest(
            table,
            new_buckets,
            n_buckets,
            base_version=newest["version"],
            file_bytes=fb,
        )

    def recommended_buckets(
        self, table: str, *, target_bucket_bytes: int = 256 * 1024 * 1024
    ) -> int:
        """The B ∝ table-size sizing rule (SCALE.md addendum 42) as a
        function: enough buckets that one bucket ≈ ``target_bucket_bytes``
        of live data, rounded UP to a power of two so the
        recommendation is stable as the table grows (it quadruples
        roughly every 4× growth instead of drifting every commit).
        Live bytes come from the newest manifest's file list — a
        metadata stat pass, no Spark job."""
        mvs = self._manifest_versions(table)
        if not mvs:
            return self.N_KEY_BUCKETS
        m = self._manifest(table, mvs[-1])
        bm = m.get("bytes")
        if bm is not None:
            live = sum(bm.values())  # pure metadata — no stat pass
        else:
            if "buckets" in m:
                paths = [
                    self.root / table / f"_kb={b}" / fn
                    for b, fs in m["buckets"].items()
                    for fn in fs
                ]
            else:
                paths = [self.root / table / fn for fn in m["files"]]
            live = sum(p.stat().st_size for p in paths if p.exists())
        want = max(1, -(-live // target_bucket_bytes))  # ceil
        b = 1
        while b < want:
            b <<= 1
        return max(b, 1)

    def maybe_rebucket(
        self,
        table: str,
        *,
        target_bucket_bytes: int = 256 * 1024 * 1024,
        grow_factor: int = 4,
    ) -> int | None:
        """Rebucket ``table`` iff the sizing rule's recommendation has
        outgrown the pinned count by ``grow_factor`` — the maintenance-
        cadence policy: checking costs one metadata stat pass, the
        re-layout runs only when the table has genuinely outgrown its
        modulus (hysteresis prevents rebucketing on every commit).
        Returns the new version number, or None when no re-layout ran.
        Never shrinks: a small B on a shrunken table costs merge
        parallelism, not correctness."""
        mvs = self._manifest_versions(table)
        newest = self._manifest(table, mvs[-1]) if mvs else None
        if newest is None or "buckets" not in newest or not newest.get("n_buckets"):
            return None
        rec = self.recommended_buckets(table, target_bucket_bytes=target_bucket_bytes)
        if rec >= grow_factor * newest["n_buckets"]:
            return self.rebucket(table, rec)
        return None

    def dv_stats(self, table: str) -> dict:
        """Merge-on-read DEBT metrics for ``table``, METADATA-ONLY (one
        manifest read + sidecar parquet FOOTERS — no data pages): how
        many live files carry deletion vectors, the deepest sidecar
        stack on any one file (the read-tax lever SCALE addendum 56
        priced), and the total tombstone row count.  The policy inputs
        :meth:`maybe_optimize` decides on."""
        mvs = self._manifest_versions(table)
        if not mvs:
            return {
                "files_total": 0, "files_dvd": 0, "dv_fraction": 0.0,
                "max_stack": 0, "tombstone_rows": 0,
            }
        m = self._manifest(table, mvs[-1])
        if "buckets" in m:
            rels = [f"{b}/{fn}" for b, fs in m["buckets"].items() for fn in fs]
        else:
            rels = list(m.get("files", []))
        dvs = m.get("dvs", {})
        live_dvs = {rel: dvs[rel] for rel in rels if rel in dvs}
        names = sorted({n for lst in live_dvs.values() for n in lst})
        rows = 0
        for n in names:
            p = self._dv_dir(table) / n
            if p.exists():
                import pyarrow.parquet as pq

                rows += pq.ParquetFile(str(p)).metadata.num_rows
        return {
            "files_total": len(rels),
            "files_dvd": len(live_dvs),
            "dv_fraction": (len(live_dvs) / len(rels)) if rels else 0.0,
            "max_stack": max((len(v) for v in live_dvs.values()), default=0),
            "tombstone_rows": rows,
        }

    def maybe_optimize(
        self,
        table: str,
        *,
        target_bytes: int = 128 * 1024 * 1024,
        dv_file_fraction: float = 0.2,
        max_dv_stack: int = 4,
        small_file_factor: int = 4,
    ) -> dict | None:
        """Compact ``table`` iff its merge-on-read debt or file
        fragmentation crossed a threshold — the maintenance-cadence
        policy (the :meth:`maybe_rebucket` pattern): CHECKING costs one
        manifest read plus sidecar footer stats, the O(table) rewrite
        runs only when a trigger fires.  Triggers:

        - ``dv_file_fraction``: the share of live files carrying
          deletion vectors (every DV'd file pays the anti-join read tax
          on every scan — flat per file, so the FRACTION is the cost);
        - ``max_dv_stack``: the deepest sidecar stack on any one file
          (bounds the tombstone-union work a single read does);
        - ``small_file_factor``: live file count vs the byte-ideal at
          ``target_bytes`` (the small-file problem).

        Compaction is the DV PURGE POINT (:meth:`optimize` rewrites
        every DV'd bucket and drops the references), so a fired trigger
        resets all three metrics.  Returns ``{'triggers': [...],
        'stats': …, 'optimized': {table: (files_before, files_after)}}``
        or None when nothing fired."""
        import math

        stats = self.dv_stats(table)
        if not stats["files_total"]:
            return None
        triggers = []
        if stats["dv_fraction"] >= dv_file_fraction:
            triggers.append("dv_file_fraction")
        if stats["max_stack"] >= max_dv_stack:
            triggers.append("max_dv_stack")
        mvs = self._manifest_versions(table)
        m = self._manifest(table, mvs[-1])
        total_bytes = sum(m.get("bytes", {}).values())
        # per-bucket compaction can't go below one file per bucket, so
        # the byte-ideal floors at the bucket count
        floor = m.get("n_buckets") or 1
        ideal = max(floor, math.ceil(total_bytes / target_bytes))
        if stats["files_total"] >= small_file_factor * ideal:
            triggers.append("small_file_factor")
        if not triggers:
            return None
        done = self.optimize(target_bytes=target_bytes, tables=[table])
        return {"triggers": triggers, "stats": stats, "optimized": done}

    # ---------------------------------------------------------- compaction
    def optimize(
        self,
        target_bytes: int = 128 * 1024 * 1024,
        cluster_by: dict[str, list[str]] | None = None,
        tables: list[str] | None = None,
    ) -> dict[str, tuple[int, int]]:
        """Compact each table to ~``target_bytes`` files (the small-file
        problem: every incremental merge writes a key-hashed partition
        set, and at 100 TB a scan's task count — and the namenode — is
        bounded by file count, not data size). Rewrites keep the
        key-hash distribution (``repartition(n, *keys)``) so merge/join
        co-location survives compaction. Returns {table: (files_before,
        files_after)}; tables already at or under target are untouched.

        Compaction goes THROUGH the manifest protocol for every layout:
        bucketed tables compact PER BUCKET (each over-fragmented
        bucket's live files are rewritten into new files and ONE new
        manifest version publishes the whole pass); flat tables rewrite
        their live file set the same way. Compaction is layout-only but
        still a commit, so the pre-compaction version remains
        time-travelable (and its old files reclaimable by vacuum). File
        counts are manifest counts: the directory also holds older
        versions' files.

        ``cluster_by`` maps table → sort columns: that table's rewrite
        range-partitions + sorts on them (a list gives lexicographic
        clustering — tight zone maps on the FIRST column; a
        ``{"zorder": [c1, c2]}`` spec interleaves two numeric columns'
        quantized bits via :func:`functions.zorder.zvalue` — Delta's
        OPTIMIZE ZORDER — so every file's zone map is a small
        RECTANGLE and :meth:`scan` prunes on EITHER dimension).
        Clustering makes the per-file zone maps recorded at commit
        TIGHT, which is what :meth:`scan`'s data skipping prunes on —
        a clustered table answers a range predicate by opening
        O(matching) files instead of all of them.
        A ``cluster_by`` table is rewritten even when already at the
        file-count target (the point is layout, not count).  Tradeoff,
        stated: a clustered FLAT table trades merge-key co-location for
        scan locality; bucketed tables keep co-location structurally
        (the bucket dir is the merge unit — clustering happens within
        buckets)."""
        import math

        from ..functions.zorder import zvalue

        def _shape_clustered(df, n_parts, spec):
            """Range-partition + sort ``df`` per the cluster spec —
            list = lexicographic, {'zorder': [c1, c2]} = Morton."""
            if isinstance(spec, dict):
                z = df.withColumn("_zv", zvalue(df, list(spec["zorder"])))
                return (
                    z.repartitionByRange(n_parts, "_zv")
                    .sortWithinPartitions("_zv")
                    .drop("_zv")
                )
            return df.repartitionByRange(n_parts, *spec).sortWithinPartitions(*spec)

        out: dict[str, tuple[int, int]] = {}
        cluster_by = cluster_by or {}
        for name in (tables if tables is not None else ALL_TABLES):
            p = Path(self._path(name))
            if not p.exists():
                continue
            ccols = cluster_by.get(name)
            mvs = self._manifest_versions(name)
            newest = self._manifest(name, mvs[-1]) if mvs else None
            if (newest is not None and "buckets" in newest) or (
                newest is None and any(d.is_dir() for d in p.glob("_kb=*"))
            ):
                # bucket-partitioned table (merge_batch_incremental):
                # compact per bucket, preserving the layout — flattening
                # it would silently disable incremental commits.
                if newest is None:
                    v = self._commit_manifest(
                        name, self._dir_buckets(name), None
                    )  # adopt pre-manifest layout (bucket count pinned later)
                    newest = self._manifest(name, v)
                b_before = b_after = 0
                new_buckets = dict(newest["buckets"])
                changed: set[str] = set()
                fb: dict[str, int] = {}
                man_bytes = newest.get("bytes", {})
                for b, fnames in sorted(newest["buckets"].items(), key=lambda kv: int(kv[0])):
                    d = p / f"_kb={b}"
                    files = [d / fn for fn in fnames]
                    b_before += len(files)
                    # per-file sizes from the manifest when recorded
                    # (no stat pass); stat only pre-size-map manifests
                    bsize = sum(
                        man_bytes.get(f"{b}/{fn}", None) or (d / fn).stat().st_size
                        for fn in fnames
                    )
                    bwant = max(1, math.ceil(bsize / target_bytes))
                    # a bucket carrying deletion vectors is ALWAYS
                    # rewritten — compaction is the DV purge point
                    # (merge-on-read debt gets paid here, not at every
                    # future scan)
                    has_dv = any(
                        f"{b}/{fn}" in newest.get("dvs", {}) for fn in fnames
                    )
                    if len(files) <= bwant and not (ccols and files) and not has_dv:
                        b_after += len(files)
                        continue
                    staged = self.root / f"_{name}_compact_{uuid.uuid4().hex[:12]}"
                    if staged.exists():
                        shutil.rmtree(staged)
                    sch = self._schema_of(newest)  # evolved tables: a
                    # mixed-schema bucket must not infer from one file
                    bdf = self._read_files_dv(
                        name,
                        newest,
                        [(f"{b}/{fn}", str(d / fn)) for fn in fnames],
                        schema=sch,
                    ).drop("_kb")
                    if ccols:
                        bdf = _shape_clustered(bdf, bwant, ccols)
                    else:
                        bdf = bdf.repartition(bwant)
                    bdf.write.mode("overwrite").parquet(str(staged))
                    names: list[str] = []
                    for f in sorted(staged.glob("part-*")):
                        fb[f"{b}/{f.name}"] = f.stat().st_size
                        f.rename(d / f.name)
                        names.append(f.name)
                    shutil.rmtree(staged, ignore_errors=True)
                    new_buckets[b] = names
                    changed.add(b)
                    b_after += len(names)
                if changed:
                    # compaction rebases over a concurrent ingest of
                    # OTHER buckets; same-bucket races raise
                    self._commit_manifest(
                        name,
                        new_buckets,
                        newest["n_buckets"],
                        base_version=newest["version"],
                        touched=changed,
                        file_bytes=fb,
                    )
                out[name] = (b_before, b_after)
                continue
            if newest is None:
                v = self._adopt_flat(name)
                newest = self._manifest(name, v)
            fnames = newest["files"]
            files = [p / fn for fn in fnames]
            bm = newest.get("bytes", {})
            size = sum(
                bm.get(fn, None) or (p / fn).stat().st_size for fn in fnames
            )
            want = max(1, math.ceil(size / target_bytes))
            has_dv = bool(newest.get("dvs"))  # DV purge point (see above)
            if len(files) <= want and not (ccols and files) and not has_dv:
                out[name] = (len(files), len(files))
                continue
            df = self._read_manifest(name, newest["version"])
            # keyless tables (future ALL_TABLES entries) still compact,
            # just without a co-location guarantee
            keys = MERGE_KEYS.get(name)
            if ccols:
                shaped = _shape_clustered(df, want, ccols)
            elif keys:
                shaped = df.repartition(want, *keys)
            else:
                shaped = df.repartition(want)
            names, fb = self._stage_flat(name, shaped, key_shuffle=False)
            self._commit_manifest(
                name, files=names, base_version=newest["version"], file_bytes=fb
            )
            out[name] = (len(files), len(names))
        return out

    # ------------------------------------------------------------ S4 export
    def export_graph(self, out_path: str) -> DataFrame:
        """Full-graph export (the reference's
        `MATCH (n) OPTIONAL MATCH (n)-[r]->(m) RETURN n, type(r), m`,
        src/api/client.rs:97-105): every edge as (src, rel_type, dst)
        plus every node as (src=key, rel_type='NODE:<label>', dst=null)
        so isolated nodes survive the round trip."""
        frames = []
        for label, key in [
            ("binaries", "hash"),
            ("functions", "uid"),
            ("strings", "uid"),
            ("libraries", "name"),
        ]:
            frames.append(
                self.read(label).select(
                    F.col(key).alias("src"),
                    F.lit(f"NODE:{label}").alias("rel_type"),
                    F.lit(None).cast("string").alias("dst"),
                )
            )
        edge_ends = {
            "contains": ("binaries", "hash", "binary_hash", "functions", "uid", "function_uid"),
            "imports": ("binaries", "hash", "binary_hash", "functions", "uid", "function_uid"),
            "imports_library": ("binaries", "hash", "binary_hash", "libraries", "name", "library_name"),
            "belongs_to": ("functions", "uid", "function_uid", "libraries", "name", "library_name"),
            "calls": ("functions", "uid", "src_uid", "functions", "uid", "dst_uid"),
            "contains_string": ("binaries", "hash", "binary_hash", "strings", "uid", "string_uid"),
        }
        for edge, (_st, _sk, src_col, _dt, _dk, dst_col) in edge_ends.items():
            e = self.read(edge)
            frames.append(
                e.select(
                    F.col(src_col).alias("src"),
                    F.lit(edge.upper()).alias("rel_type"),
                    F.col(dst_col).alias("dst"),
                )
            )
        edges = frames[0]
        for f in frames[1:]:
            edges = edges.unionByName(f)
        edges.write.mode("overwrite").json(out_path)
        return edges
