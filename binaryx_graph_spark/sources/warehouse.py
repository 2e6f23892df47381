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

Commit protocols (two, per table state):

* **Flat tables** (:meth:`merge_batch`) — whole-table rewrite; the
  replaced directory is archived as the next snapshot (directory-
  granularity versioning; POSIX renames).
* **Bucketed tables** (:meth:`merge_batch_incremental`) — Delta/
  Iceberg-lite MANIFEST protocol: data files are IMMUTABLE once
  written; each commit writes the merged content of only the touched
  key-buckets as NEW files, then publishes a manifest
  (``<root>/_manifests/<table>/vNNNNN.json`` — the bucket→file-list map
  plus the pinned bucket count) whose single atomic rename IS the
  commit.  No live data file is ever renamed, rewritten, or deleted by
  a commit, so the protocol is object-store-safe (on S3 the manifest
  rename maps to one conditional PUT of a small object; orphaned data
  files from a crashed commit are invisible to readers and swept by
  :meth:`vacuum`).  Reads resolve through the newest manifest;
  ``read(table, version=N)`` resolves through manifest ``N`` — old
  versions SHARE unchanged files with new ones, so time travel costs
  zero extra bytes; :meth:`rollback` is a pure metadata commit (a new
  manifest that repeats an old file list); :meth:`vacuum` deletes
  exactly the files unreachable from the retained manifests.

Version numbers are one monotone sequence per table across both
protocols: converting a flat table to the bucketed layout archives the
flat state as the next directory snapshot, and the first manifest takes
the following number — every version ever committed stays readable
until vacuumed.
"""

from __future__ import annotations

import json
import os
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
        """Read a table — the live state, or (time travel) a committed
        version by number (see :meth:`versions`). Bucket-partitioned
        tables resolve through their manifest; the internal ``_kb``
        partition column is never part of the logical schema, live or
        versioned."""
        mvs = self._manifest_versions(table)
        if version is not None:
            if version in mvs:
                df = self._read_manifest(table, version)
                return df.drop("_kb") if "_kb" in df.columns else df
            vp = self._version_dir(table) / f"v{version:05d}"
            if not vp.exists():
                raise FileNotFoundError(
                    f"warehouse table '{table}' has no version {version} "
                    f"(available: {self.versions(table)})"
                )
            df = self.spark.read.parquet(str(vp))
            return df.drop("_kb") if "_kb" in df.columns else df
        if mvs:
            return self._read_manifest(table, mvs[-1]).drop("_kb")
        if not (self.root / table).exists():
            raise FileNotFoundError(
                f"warehouse table '{table}' not found under {self.root} — "
                f"run `import` (or `db init`) against this warehouse first"
            )
        df = self.spark.read.parquet(self._path(table))
        # pre-manifest bucketed dirs (legacy layout) still carry _kb
        return df.drop("_kb") if "_kb" in df.columns else df

    # ------------------------------------------------- snapshot versioning
    #
    # Flat tables: every commit (merge_batch, rollback) that replaces the
    # table directory ARCHIVES the replaced directory as the next
    # immutable snapshot instead of deleting it — a rename, so versioning
    # costs zero extra writes.  Bucketed tables: versioning is manifest-
    # granular (see module docstring) — old and new versions SHARE the
    # files of untouched buckets, the Delta/Iceberg retained-files idea.

    def _version_dir(self, table: str) -> Path:
        return self.root / "_versions" / table

    def _legacy_versions(self, table: str) -> list[int]:
        vd = self._version_dir(table)
        if not vd.exists():
            return []
        return sorted(int(p.name[1:]) for p in vd.glob("v*") if p.is_dir())

    def versions(self, table: str) -> list[int]:
        """Committed version numbers for a table, oldest first — one
        monotone sequence spanning directory snapshots (flat commits)
        and manifests (bucketed commits). For a flat table the live
        directory is one commit NEWER than the highest snapshot; for a
        bucketed table the highest manifest IS the live state."""
        return sorted(self._legacy_versions(table) + self._manifest_versions(table))

    def _archive(self, table: str, old_dir: Path) -> None:
        """Move a replaced table directory into the version store."""
        vd = self._version_dir(table)
        vd.mkdir(parents=True, exist_ok=True)
        nxt = (self.versions(table) or [-1])[-1] + 1
        old_dir.rename(vd / f"v{nxt:05d}")

    def rollback(self, table: str, version: int) -> None:
        """Restore a table to a committed version. Rollback is itself a
        commit: for a bucketed table it publishes a NEW manifest that
        repeats the target version's file list — pure metadata, zero
        data bytes moved (rolling back ACROSS the flat→bucketed
        conversion re-buckets the snapshot's content as new files, an
        O(snapshot) commit); for a flat table the current live state is
        archived first and the snapshot is copied in (the snapshot stays
        in the version store so rolling forward again remains possible)."""
        mvs = self._manifest_versions(table)
        if mvs:
            if version not in mvs:
                vp = self._version_dir(table) / f"v{version:05d}"
                if not vp.exists():
                    raise FileNotFoundError(
                        f"no version {version} for '{table}' (available: {self.versions(table)})"
                    )
                # rollback ACROSS the flat→bucketed conversion: a real
                # commit — the snapshot's content is re-bucketed as NEW
                # immutable files replacing every bucket (O(snapshot),
                # the same one-time pass the conversion paid); the
                # bucketed layout and its pinned count survive, so later
                # incremental commits keep working
                prev = self._manifest(table, mvs[-1])
                nb = prev["n_buckets"] or self.N_KEY_BUCKETS
                keys = MERGE_KEYS[table]
                kb = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(nb)).cast("int")
                df = self.read(table, version=version).withColumn("_kb", kb)
                staging = self.root / f"_{table}_inc_staging"
                if staging.exists():
                    shutil.rmtree(staging)
                df.repartition(F.col("_kb")).write.partitionBy("_kb").mode(
                    "overwrite"
                ).parquet(str(staging))
                new_buckets: dict[str, list[str]] = {}
                path = self.root / table
                for src in staging.glob("_kb=*"):
                    b = src.name.split("=", 1)[1]
                    dst = path / src.name
                    dst.mkdir(parents=True, exist_ok=True)
                    names = []
                    for f in sorted(src.glob("part-*")):
                        f.rename(dst / f.name)
                        names.append(f.name)
                    new_buckets[b] = names
                shutil.rmtree(staging, ignore_errors=True)
                self._commit_manifest(table, new_buckets, nb)
                return
            m = self._manifest(table, version)
            self._commit_manifest(table, m["buckets"], m["n_buckets"])
            return
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
        """Drop all but the newest ``keep_last`` non-live versions per
        table (time-travel horizon vs storage), then — for bucketed
        tables — delete every data file unreachable from the retained
        manifests (which also sweeps orphans left by crashed commits:
        the manifest is the precise reachable-file set). Returns
        {table: n_versions_removed}."""
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
                for v in mvs:
                    if v not in retain:
                        (self._manifest_dir(name) / f"v{v:05d}.json").unlink()
                        removed += 1
                for v in self._legacy_versions(name):
                    if v not in retain:
                        shutil.rmtree(self._version_dir(name) / f"v{v:05d}")
                        removed += 1
                reach: set[str] = set()
                for v in self._manifest_versions(name):
                    m = self._manifest(name, v)
                    for b, files in m["buckets"].items():
                        reach |= {f"_kb={b}/{fn}" for fn in files}
                tdir = self.root / name
                for f in tdir.glob("_kb=*/*"):
                    rel = f"{f.parent.name}/{f.name}"
                    if f.is_file() and not f.name.startswith((".", "_")) and rel not in reach:
                        f.unlink()
                        crc = f.with_name(f".{f.name}.crc")  # local-FS sidecar
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
        "what does this version own"); flat tables get a final 'live'
        row for the current directory."""
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
            paths = [
                self.root / table / f"_kb={b}" / fn
                for b, fs in m["buckets"].items()
                for fn in fs
            ]
            rows.append(
                {
                    "version": v,
                    "kind": "manifest",
                    "n_files": len(paths),
                    "bytes": sum(p.stat().st_size for p in paths if p.exists()),
                    "n_buckets": m["n_buckets"],
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
        self, table: str, buckets: dict[str, list[str]], n_buckets: int | None
    ) -> int:
        """Publish a new table version. Write-tmp-then-rename of ONE
        small json file — the only atomic step the commit needs (the
        object-store analog is a single conditional PUT). Single-writer
        per table, like every directory-commit protocol here."""
        md = self._manifest_dir(table)
        md.mkdir(parents=True, exist_ok=True)
        nxt = (self.versions(table) or [-1])[-1] + 1
        doc = {
            "version": nxt,
            "n_buckets": n_buckets,
            "buckets": {str(b): sorted(fs) for b, fs in sorted(buckets.items(), key=lambda kv: int(kv[0]))},
        }
        tmp = md / f"v{nxt:05d}.json.tmp"
        tmp.write_text(json.dumps(doc, sort_keys=True))
        os.replace(tmp, md / f"v{nxt:05d}.json")
        return nxt

    def _dir_buckets(self, table: str) -> dict[str, list[str]]:
        """Bucket→file map from the current directory state (used once,
        to ADOPT a pre-manifest bucketed table or a fresh conversion)."""
        path = self.root / table
        return {
            d.name.split("=", 1)[1]: sorted(
                f.name for f in d.glob("part-*") if f.is_file()
            )
            for d in path.glob("_kb=*")
            if d.is_dir()
        }

    def _read_manifest(self, table: str, version: int) -> DataFrame:
        """Read exactly the files a manifest lists (WITH the inferred
        ``_kb`` partition column — internal callers prune/repartition on
        it; :meth:`read` drops it)."""
        m = self._manifest(table, version)
        base = self.root / table
        files = [
            str(base / f"_kb={b}" / fn)
            for b, fns in m["buckets"].items()
            for fn in fns
        ]
        if not files:
            if table in ALL_TABLES:
                empty = self.spark.createDataFrame([], ALL_TABLES[table][0])
            else:
                empty = self.spark.read.parquet(str(base)).limit(0).drop("_kb")
            return empty.withColumn("_kb", F.lit(None).cast("int"))
        return self.spark.read.option("basePath", str(base)).parquet(*files)

    def _live_bucket_files(self, table: str) -> dict[str, list[str]]:
        """Live bucket→file map (manifest if present, else directory)."""
        mvs = self._manifest_versions(table)
        if mvs:
            return self._manifest(table, mvs[-1])["buckets"]
        return self._dir_buckets(table)

    # ------------------------------------------------------ E9/E10 upsert
    def merge_batch(self, tables: dict[str, DataFrame], batch_seq: int = 1) -> None:
        """MERGE-upsert a batch into the warehouse: stored rows are seq 0,
        batch rows seq ``batch_seq``; last-write-wins per MERGE key.

        At scale the window dedup shuffles on the merge key once — the
        same shuffle MERGE INTO would need; no driver-side loop.

        Flat tables only: a table converted to the bucketed layout by
        :meth:`merge_batch_incremental` rejects the whole-table-rewrite
        path loudly instead of mangling the partitioned layout.
        """
        for name, df in tables.items():
            if name not in MERGE_KEYS:
                continue
            path = self._path(name)
            if self._manifest_versions(name) or any(Path(path).glob("_kb=*")):
                raise ValueError(
                    f"table '{name}' is bucket-partitioned (incremental layout); "
                    f"use merge_batch_incremental for it"
                )
            keys = MERGE_KEYS[name]
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
    #: is a per-table knob sized so one bucket ≈ a few target files.
    #: The count is PINNED in the table's manifest at conversion time —
    #: a later commit with a different count raises (a silent modulus
    #: change would scatter each key across two buckets and break LWW).
    N_KEY_BUCKETS = 64

    def merge_batch_incremental(
        self, tables: dict[str, DataFrame], batch_seq: int = 1, *, n_buckets: int | None = None
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
        a manifest whose single atomic rename is the commit (module
        docstring: the object-store-safe protocol).  Untouched buckets'
        files are never opened, rewritten, or moved — old and new
        versions share them, which is also what makes every commit a
        time-travelable version for free.

        Cost per commit: O(|batch| + |touched buckets|) — with B
        buckets and a batch touching k keys, at most min(k, B)/B of the
        table is rewritten.  Returns {table: n_touched_buckets}.

        The dedup invariant is enforced per bucket, which is equivalent
        to global LWW because the bucket is a FUNCTION of the merge
        key: a key's every version lands in the same bucket."""
        out: dict[str, int] = {}
        for name, df in tables.items():
            if name not in MERGE_KEYS:
                continue
            keys = MERGE_KEYS[name]
            path = Path(self._path(name))
            mvs = self._manifest_versions(name)
            prev: dict | None = self._manifest(name, mvs[-1]) if mvs else None
            if prev is None and path.exists() and any(path.glob("_kb=*")):
                # adopt a pre-manifest bucketed table: snapshot the current
                # directory state as its first manifest (bucket count
                # pinned from this call onward)
                nb0 = n_buckets or self.N_KEY_BUCKETS
                v = self._commit_manifest(name, self._dir_buckets(name), nb0)
                prev = self._manifest(name, v)
            if prev is not None:
                if n_buckets is not None and prev["n_buckets"] is not None and n_buckets != prev["n_buckets"]:
                    raise ValueError(
                        f"table '{name}' is laid out with n_buckets="
                        f"{prev['n_buckets']}; got n_buckets={n_buckets} — a "
                        f"modulus change scatters keys across buckets and "
                        f"breaks the MERGE invariant; re-bucketing requires a "
                        f"full conversion"
                    )
                nb = prev["n_buckets"] if prev["n_buckets"] is not None else (n_buckets or self.N_KEY_BUCKETS)
            else:
                nb = n_buckets or self.N_KEY_BUCKETS
            kb = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(nb)).cast("int")
            batch = df.withColumn("_kb", kb)
            staging = self.root / f"_{name}_inc_staging"
            if staging.exists():
                shutil.rmtree(staging)
            if prev is None:
                # first commit (or conversion from a flat table): full
                # bucketed write — the one unavoidable O(table) pass
                base = batch
                existed = path.exists()
                if existed:
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
                # repartition BY BUCKET, not by key: partitionBy would
                # otherwise emit one file per (shuffle task x bucket) —
                # 32x512 tiny files on the first commit. One task per
                # bucket -> one file per bucket; key co-location holds at
                # bucket granularity (bucket is a function of the key).
                base.repartition(F.col("_kb")).write.partitionBy("_kb").mode(
                    "overwrite"
                ).parquet(str(staging))
                # converting archives the flat state as the next snapshot —
                # pre-conversion history stays readable
                self._swap_in(staging, path, archive_as=name if existed else None)
                self._commit_manifest(name, self._dir_buckets(name), nb)
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
            stored_files = [
                str(path / f"_kb={b}" / fn)
                for b in touched
                for fn in prev["buckets"].get(str(b), [])
            ]
            if stored_files:
                stored_sub = (
                    self.spark.read.option("basePath", str(path))
                    .parquet(*stored_files)  # manifest-level pruning
                    .withColumn("_seq", F.lit(0))
                )
                merged = stored_sub.unionByName(batch.withColumn("_seq", F.lit(batch_seq)))
                w = Window.partitionBy(*keys).orderBy(F.desc("_seq"))
                merged = (
                    merged.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn", "_seq")
                )
            else:
                merged = batch.dropDuplicates(keys)
            # stage the merged buckets, then move each NEW file into its
            # bucket directory: data files are immutable, so nothing a
            # reader can hold is ever renamed or deleted — the manifest
            # rename below is the only commit point
            merged.repartition(F.col("_kb")).write.partitionBy("_kb").mode(
                "overwrite"
            ).parquet(str(staging))
            new_buckets = dict(prev["buckets"])
            for b in touched:
                src = staging / f"_kb={b}"
                names: list[str] = []
                if src.exists():
                    dst = path / f"_kb={b}"
                    dst.mkdir(parents=True, exist_ok=True)
                    for f in sorted(src.glob("part-*")):
                        f.rename(dst / f.name)  # unique (job-UUID) names: no clash
                        names.append(f.name)
                new_buckets[str(b)] = names  # [] = batch emptied the bucket
            shutil.rmtree(staging, ignore_errors=True)
            self._commit_manifest(name, new_buckets, nb)
            out[name] = len(touched)
        return out

    def _swap_in(self, tmp: Path, final: Path, *, archive_as: str | None = None) -> None:
        """Replace ``final`` with ``tmp`` without a window where the table
        directory is missing: rename old → backup (atomic), tmp → final
        (atomic), then archive the backup as the next snapshot (rename,
        atomic) — or delete it when versioning is off for this swap. A
        crash leaves either the old or the new table readable (plus at
        worst a stale ``_backup``/staging dir), never a missing one.
        Flat-table protocol only — bucketed tables commit via
        :meth:`_commit_manifest` and never rename live data."""
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
        files_after)}; tables already at or under target are untouched.

        Bucketed tables compact PER BUCKET through the manifest
        protocol: each over-fragmented bucket's live files are rewritten
        into new files and ONE new manifest version publishes the whole
        pass — compaction is layout-only but still a commit, so the
        pre-compaction version remains time-travelable (and its old
        files reclaimable by vacuum). File counts are manifest counts:
        the directory also holds older versions' files."""
        import math

        out: dict[str, tuple[int, int]] = {}
        for name in ALL_TABLES:
            p = Path(self._path(name))
            if not p.exists():
                continue
            mvs = self._manifest_versions(name)
            if mvs or any(d.is_dir() for d in p.glob("_kb=*")):
                # bucket-partitioned table (merge_batch_incremental):
                # compact per bucket, preserving the layout — flattening
                # it would silently disable incremental commits.
                if mvs:
                    prev = self._manifest(name, mvs[-1])
                else:
                    v = self._commit_manifest(
                        name, self._dir_buckets(name), None
                    )  # adopt pre-manifest layout (bucket count pinned later)
                    prev = self._manifest(name, v)
                b_before = b_after = 0
                new_buckets = dict(prev["buckets"])
                changed = False
                for b, fnames in sorted(prev["buckets"].items(), key=lambda kv: int(kv[0])):
                    d = p / f"_kb={b}"
                    files = [d / fn for fn in fnames]
                    b_before += len(files)
                    bwant = max(
                        1, math.ceil(sum(f.stat().st_size for f in files) / target_bytes)
                    )
                    if len(files) <= bwant:
                        b_after += len(files)
                        continue
                    staged = self.root / f"_{name}_compact_bucket"
                    if staged.exists():
                        shutil.rmtree(staged)
                    self.spark.read.parquet(*[str(f) for f in files]).repartition(
                        bwant
                    ).write.mode("overwrite").parquet(str(staged))
                    names: list[str] = []
                    for f in sorted(staged.glob("part-*")):
                        f.rename(d / f.name)
                        names.append(f.name)
                    shutil.rmtree(staged, ignore_errors=True)
                    new_buckets[b] = names
                    changed = True
                    b_after += len(names)
                if changed:
                    self._commit_manifest(name, new_buckets, prev["n_buckets"])
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
