"""Parquet warehouse (reference S4-S6: schema init, export, clear —
/root/reference/src/neo4j/schema.rs:13-76, src/api/client.rs:97-105,
src/neo4j/connection.rs:169-174).

Layout: one parquet dataset per node/edge table under a root directory.
Unique constraints (schema.rs:20-29) are dedup invariants enforced by
:func:`merge_batch`; b-tree indexes are unnecessary (Catalyst pushdown);
the Lucene fulltext index becomes a derived posting table
(operators/search.py).

Scale posture: node/edge tables are hash-distributed on their key at
write time (``repartition(key)``) so later joins/merges co-locate; on a
real cluster the same code writes bucketed tables.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..model import EDGE_TABLES, NODE_TABLES

ALL_TABLES = {**NODE_TABLES, **EDGE_TABLES}

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
}


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)

    def _path(self, table: str) -> str:
        return str(self.root / table)

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

    def read(self, table: str, version: int | None = None) -> DataFrame:
        """Read a table — the live state, or (time travel) an archived
        snapshot by version number (see :meth:`versions`)."""
        if version is not None:
            vp = self._version_dir(table) / f"v{version:05d}"
            if not vp.exists():
                raise FileNotFoundError(
                    f"warehouse table '{table}' has no snapshot v{version} "
                    f"(available: {self.versions(table)})"
                )
            return self.spark.read.parquet(str(vp))
        if not (self.root / table).exists():
            raise FileNotFoundError(
                f"warehouse table '{table}' not found under {self.root} — "
                f"run `import` (or `db init`) against this warehouse first"
            )
        df = self.spark.read.parquet(self._path(table))
        # bucket-partitioned tables (merge_batch_incremental) carry the
        # internal _kb partition column — never part of the logical schema
        return df.drop("_kb") if "_kb" in df.columns else df

    # ------------------------------------------------- snapshot versioning
    #
    # Table-format-lite time travel: every commit (merge_batch, optimize,
    # rollback) that replaces a table directory ARCHIVES the replaced
    # directory as the next immutable snapshot instead of deleting it —
    # a rename, so versioning costs zero extra writes (the same
    # retained-files idea as Delta/Iceberg, at directory granularity
    # instead of file-manifest granularity; at 100 TB you'd track files
    # in a manifest to share them across versions — the CONTRACT here is
    # the same: read-at-version, rollback-as-new-commit, vacuum).

    def _version_dir(self, table: str) -> Path:
        return self.root / "_versions" / table

    def versions(self, table: str) -> list[int]:
        """Archived snapshot numbers for a table, oldest first. The live
        directory is always one commit NEWER than the highest snapshot."""
        vd = self._version_dir(table)
        if not vd.exists():
            return []
        return sorted(int(p.name[1:]) for p in vd.glob("v*") if p.is_dir())

    def _archive(self, table: str, old_dir: Path) -> None:
        """Move a replaced table directory into the version store."""
        vd = self._version_dir(table)
        vd.mkdir(parents=True, exist_ok=True)
        nxt = (self.versions(table) or [-1])[-1] + 1
        old_dir.rename(vd / f"v{nxt:05d}")

    def rollback(self, table: str, version: int) -> None:
        """Restore a table to an archived snapshot. Rollback is itself a
        commit: the current live state is archived first, and the
        snapshot stays in the version store (copied in, not moved) so
        rolling forward again remains possible."""
        vp = self._version_dir(table) / f"v{version:05d}"
        if not vp.exists():
            raise FileNotFoundError(
                f"no snapshot v{version} for '{table}' (available: {self.versions(table)})"
            )
        tmp = self.root / f"_{table}_rollback"
        if tmp.exists():
            shutil.rmtree(tmp)
        shutil.copytree(vp, tmp)
        self._swap_in(tmp, self.root / table, archive_as=table)

    def vacuum(self, keep_last: int = 2) -> dict[str, int]:
        """Drop all but the newest ``keep_last`` snapshots per table
        (time-travel horizon vs storage). Returns {table: n_removed}."""
        out: dict[str, int] = {}
        for name in ALL_TABLES:
            vs = self.versions(name)
            drop = vs[:-keep_last] if keep_last > 0 else vs
            for v in drop:
                shutil.rmtree(self._version_dir(name) / f"v{v:05d}")
            if drop:
                out[name] = len(drop)
        return out

    # ------------------------------------------------------ E9/E10 upsert
    def merge_batch(self, tables: dict[str, DataFrame], batch_seq: int = 1) -> None:
        """MERGE-upsert a batch into the warehouse: stored rows are seq 0,
        batch rows seq ``batch_seq``; last-write-wins per MERGE key.

        At scale the window dedup shuffles on the merge key once — the
        same shuffle MERGE INTO would need; no driver-side loop.
        """
        for name, df in tables.items():
            if name not in MERGE_KEYS:
                continue
            keys = MERGE_KEYS[name]
            path = self._path(name)
            if Path(path).exists():
                stored = self.spark.read.parquet(path).withColumn("_seq", F.lit(0))
                merged = stored.unionByName(df.withColumn("_seq", F.lit(batch_seq)))
                w = Window.partitionBy(*keys).orderBy(F.desc("_seq"))
                merged = (
                    merged.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn", "_seq")
                )
            else:
                merged = df.dropDuplicates(keys)
            # parquet can't overwrite in place while reading — stage then move
            tmp = str(self.root / f"_{name}_staging")
            merged.repartition(*keys).write.mode("overwrite").parquet(tmp)
            self._swap_in(Path(tmp), Path(path), archive_as=name)

    # -------------------------------------------- incremental MERGE
    #: key-bucket count for incrementally merged tables; at 100 TB this
    #: is a per-table knob sized so one bucket ≈ a few target files
    N_KEY_BUCKETS = 64

    def merge_batch_incremental(
        self, tables: dict[str, DataFrame], batch_seq: int = 1, *, n_buckets: int | None = None
    ) -> dict[str, int]:
        """MERGE-upsert that rewrites ONLY the key-buckets the batch
        touches — the scale fix for :meth:`merge_batch`, whose
        whole-table rewrite makes a stream of small commits O(table)
        EACH (quadratic total at 100 TB).  Layout: the table is
        hive-partitioned by ``_kb = pmod(xxhash64(keys), n_buckets)``;
        a commit computes the batch's bucket set, reads ONLY those
        partitions back (partition pruning does the skip), applies the
        same last-write-wins window as merge_batch, stages the merged
        buckets, and swaps each bucket directory in — untouched buckets'
        files are never opened, rewritten, or moved (the gate row
        asserts they stay byte-for-byte identical, mtimes included).

        Cost per commit: O(|batch| + |touched buckets|) — with B
        buckets and a batch touching k keys, at most min(k, B)/B of the
        table is rewritten.  Returns {table: n_touched_buckets}.

        Trade-offs vs merge_batch (documented, not hidden): no snapshot
        archive per commit (file-granularity time travel needs a
        manifest — the upgrade path stated in the module docstring), and
        the dedup invariant is enforced per bucket, which is equivalent
        because the bucket is a FUNCTION of the merge key: a key's every
        version lands in the same bucket, so per-bucket LWW == global
        LWW."""
        out: dict[str, int] = {}
        for name, df in tables.items():
            if name not in MERGE_KEYS:
                continue
            keys = MERGE_KEYS[name]
            nb = n_buckets or self.N_KEY_BUCKETS
            kb = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(nb)).cast("int")
            batch = df.withColumn("_kb", kb)
            path = Path(self._path(name))
            if not path.exists() or not any(path.glob("_kb=*")):
                # first commit (or conversion from a flat table): full
                # bucketed write — the one unavoidable O(table) pass
                base = batch
                if path.exists():
                    stored = self.read(name).withColumn("_kb", kb).withColumn(
                        "_seq", F.lit(0)
                    )
                    base = stored.unionByName(batch.withColumn("_seq", F.lit(batch_seq)))
                    w = Window.partitionBy(*keys).orderBy(F.desc("_seq"))
                    base = (
                        base.withColumn("_rn", F.row_number().over(w))
                        .filter(F.col("_rn") == 1)
                        .drop("_rn", "_seq")
                    )
                else:
                    base = base.dropDuplicates(keys)
                tmp = self.root / f"_{name}_inc_staging"
                if tmp.exists():
                    shutil.rmtree(tmp)
                # repartition BY BUCKET, not by key: partitionBy would
                # otherwise emit one file per (shuffle task x bucket) —
                # 32x512 tiny files on the first commit. One task per
                # bucket -> one file per bucket; key co-location holds at
                # bucket granularity (bucket is a function of the key).
                base.repartition(F.col("_kb")).write.partitionBy("_kb").mode(
                    "overwrite"
                ).parquet(str(tmp))
                self._swap_in(tmp, path)
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
            stored_sub = (
                self.spark.read.parquet(str(path))
                .filter(F.col("_kb").isin(touched))  # partition pruning
                .withColumn("_seq", F.lit(0))
            )
            merged = stored_sub.unionByName(batch.withColumn("_seq", F.lit(batch_seq)))
            w = Window.partitionBy(*keys).orderBy(F.desc("_seq"))
            merged = (
                merged.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_seq")
            )
            tmp = self.root / f"_{name}_inc_staging"
            if tmp.exists():
                shutil.rmtree(tmp)
            # stage the touched buckets, then swap each bucket directory —
            # the read above must finish before its source dirs move, so
            # the staged write IS the materialization barrier
            merged.repartition(F.col("_kb")).write.partitionBy("_kb").mode(
                "overwrite"
            ).parquet(str(tmp))
            for b in touched:
                src = tmp / f"_kb={b}"
                dst = path / f"_kb={b}"
                if not src.exists():
                    src.mkdir()  # batch emptied the bucket: swap in empty
                backup = path / f"_kb={b}__backup"
                if backup.exists():
                    shutil.rmtree(backup)
                if dst.exists():
                    dst.rename(backup)
                src.rename(dst)
                if backup.exists():
                    shutil.rmtree(backup)
            shutil.rmtree(tmp, ignore_errors=True)
            out[name] = len(touched)
        return out

    def _swap_in(self, tmp: Path, final: Path, *, archive_as: str | None = None) -> None:
        """Replace ``final`` with ``tmp`` without a window where the table
        directory is missing: rename old → backup (atomic), tmp → final
        (atomic), then archive the backup as the next snapshot (rename,
        atomic) — or delete it when versioning is off for this swap. A
        crash leaves either the old or the new table readable (plus at
        worst a stale ``_backup``/staging dir), never a missing one."""
        backup = final.with_name(f"_{final.name}_backup")
        if backup.exists():
            shutil.rmtree(backup)
        if final.exists():
            final.rename(backup)
        tmp.rename(final)
        if backup.exists():
            if archive_as is not None:
                self._archive(archive_as, backup)
            else:
                shutil.rmtree(backup)

    # ---------------------------------------------------------- compaction
    def optimize(self, target_bytes: int = 128 * 1024 * 1024) -> dict[str, tuple[int, int]]:
        """Compact each table to ~``target_bytes`` files (the small-file
        problem: every incremental merge writes a key-hashed partition
        set, and at 100 TB a scan's task count — and the namenode — is
        bounded by file count, not data size). Rewrites keep the
        key-hash distribution (``repartition(n, *keys)``) so merge/join
        co-location survives compaction. Returns {table: (files_before,
        files_after)}; tables already at or under target are untouched."""
        import math

        out: dict[str, tuple[int, int]] = {}
        for name in ALL_TABLES:
            p = Path(self._path(name))
            if not p.exists():
                continue
            bucket_dirs = sorted(d for d in p.glob("_kb=*") if d.is_dir())
            if bucket_dirs:
                # bucket-partitioned table (merge_batch_incremental):
                # compact PER BUCKET, preserving the layout — flattening
                # it would silently disable incremental commits.  Each
                # over-fragmented bucket is rewritten and swapped alone;
                # right-sized buckets are never opened.
                b_before = b_after = 0
                for d in bucket_dirs:
                    bfiles = [f for f in d.glob("part-*") if f.is_file()]
                    b_before += len(bfiles)
                    bwant = max(
                        1,
                        math.ceil(sum(f.stat().st_size for f in bfiles) / target_bytes),
                    )
                    if len(bfiles) <= bwant:
                        b_after += len(bfiles)
                        continue
                    staged = self.root / f"_{name}_compact_bucket"
                    if staged.exists():
                        shutil.rmtree(staged)
                    self.spark.read.parquet(str(d)).repartition(bwant).write.mode(
                        "overwrite"
                    ).parquet(str(staged))
                    backup = d.with_name(d.name + "__backup")
                    if backup.exists():
                        shutil.rmtree(backup)
                    d.rename(backup)
                    staged.rename(d)
                    shutil.rmtree(backup)
                    b_after += len([f for f in d.glob("part-*") if f.is_file()])
                out[name] = (b_before, b_after)
                continue
            files = [f for f in p.glob("part-*") if f.is_file()]
            size = sum(f.stat().st_size for f in files)
            want = max(1, math.ceil(size / target_bytes))
            if len(files) <= want:
                out[name] = (len(files), len(files))
                continue
            keys = MERGE_KEYS.get(name)
            df = self.spark.read.parquet(str(p))
            tmp = str(self.root / f"_{name}_compact")
            # keyless tables (future ALL_TABLES entries) still compact,
            # just without a co-location guarantee — same guard shape as
            # merge_batch rather than a KeyError.
            part = df.repartition(want, *keys) if keys else df.repartition(want)
            part.write.mode("overwrite").parquet(tmp)
            self._swap_in(Path(tmp), p)  # compaction is a rewrite, not a data change: no snapshot
            after = len([f for f in p.glob("part-*") if f.is_file()])
            out[name] = (len(files), after)
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
