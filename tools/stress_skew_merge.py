"""Skewed-key MERGE INTO stress (r12 judge directive #7): one hot merge
key range concentrating a single bucket is the realistic 100 TB failure
mode for CDC apply — a zipfian update stream where most changed keys
hash-collide into one bucket serializes that bucket's read-merge-write
while every other task idles.

Control discipline (the `stress_skew_dedup` pattern): same seeded table
(B buckets), same source SIZE, ABBA-interleaved timed runs; the only
variable is the source's key→bucket distribution:

* **control** — uids drawn uniformly (≈ n/B rows per bucket);
* **skewed** — 90% of source uids pre-filtered to ONE bucket's key
  space (bucket 0 via the same ``pmod(xxhash64(uid), B)`` the commit
  path uses), 10% uniform.

After each timed MOR ``merge_into`` the table ROLLS BACK to the seed
version (a pure-metadata commit — bucketed→bucketed), so every run
merges against identical state.

What the numbers mean at scale: commit VOLUME is O(touched buckets)
either way (the skewed arm touches ~1+ buckets and writes less), but
WALL TIME tracks the hottest bucket, not the mean — the skewed arm's
per-bucket max is ~B× the control's. AQE (enabled in the session) can
split skewed shuffle partitions of the JOIN, but the per-bucket write
stays serialized by design (one bucket = one file set). The mitigation
the warehouse already ships is structural, not runtime: size B so a
bucket ≈ a batch (`recommended_buckets`, SCALE.md addendum 42), and
`maybe_rebucket` re-layouts when the live distribution drifts.

Prints one JSON line; a markdown table goes to stderr.

Usage: python -m tools.stress_skew_merge [n_rows] [n_buckets] [batch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from binaryx_graph_spark.session import get_spark  # noqa: E402
from binaryx_graph_spark.sources.warehouse import Warehouse  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 256_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    # default batch sized so the hot arm FITS one bucket's key space
    # (~n_rows/n_buckets keys per bucket): 0.9*batch <= 4000 at the
    # defaults — both arms then merge the SAME row count and the only
    # variable is the key->bucket distribution
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4_000
    spark = get_spark("stress-skew-merge")
    root = os.path.join(tempfile.gettempdir(), "bxg_skew_merge")
    shutil.rmtree(root, ignore_errors=True)
    wh = Warehouse(spark, root)

    base = spark.range(n_rows).select(
        F.col("id").cast("string").alias("uid"),
        F.concat(F.lit("fn_"), F.col("id")).alias("name"),
        F.lit("").alias("address"),
        F.col("id").cast("long").alias("size"),
        F.lit("Internal").alias("type"),
    )
    wh.merge_batch_incremental({"functions": base}, n_buckets=n_buckets)
    seed_v = wh.versions("functions")[-1]

    bucket_of = F.pmod(F.xxhash64(F.col("uid")), F.lit(n_buckets))

    # control: uniform sample of `batch` uids (deterministic stride)
    stride = n_rows // batch
    control = base.filter(F.col("size") % stride == 0).limit(batch)
    # skewed: 90% from bucket 0's key space, 10% uniform
    hot_n = int(batch * 0.9)
    hot = base.filter(bucket_of == 0).limit(hot_n)
    cold = (
        base.filter((bucket_of != 0) & (F.col("size") % stride == 1))
        .limit(batch - hot_n)
    )
    skewed = hot.unionAll(cold)

    sources = {
        "control": control.select(
            "uid", (F.col("size") + 1_000_000).alias("new_size")
        ).localCheckpoint(eager=True),
        "skewed": skewed.select(
            "uid", (F.col("size") + 1_000_000).alias("new_size")
        ).localCheckpoint(eager=True),
    }

    def bucket_hist(df):
        rows = (
            df.groupBy(F.pmod(F.xxhash64(F.col("uid")), F.lit(n_buckets)).alias("b"))
            .count()
            .agg(
                F.max("count").alias("mx"),
                F.expr("percentile_approx(count, 0.5)").alias("med"),
                F.count(F.lit(1)).alias("n_buckets_touched"),
            )
            .collect()[0]
        )
        return {
            "max_rows_per_bucket": int(rows["mx"]),
            "median_rows_per_bucket": int(rows["med"]),
            "buckets_touched": int(rows["n_buckets_touched"]),
        }

    out = {
        "n_rows": n_rows,
        "n_buckets": n_buckets,
        "batch": batch,
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
        "skew_join_handling": spark.conf.get(
            "spark.sql.adaptive.skewJoin.enabled", "unset"
        ),
        "source_shape": {k: bucket_hist(v) for k, v in sources.items()},
        "runs": {},
    }

    for label in ("control", "skewed", "skewed", "control"):  # ABBA
        t0 = time.monotonic()
        stats = wh.merge_into(
            "functions",
            sources[label],
            when_matched_update={"size": F.col("s.new_size")},
            when_not_matched_insert=False,
        )
        sec = round(time.monotonic() - t0, 2)
        r = out["runs"].setdefault(
            label,
            {"sec": [], "rows_updated": stats["rows_updated"],
             "buckets_touched": stats["buckets_touched"]},
        )
        r["sec"].append(sec)
        wh.rollback("functions", seed_v)  # pure-metadata reset

    for r in out["runs"].values():
        r["min_sec"] = min(r["sec"])
    out["skew_ratio"] = round(
        out["runs"]["skewed"]["min_sec"] / out["runs"]["control"]["min_sec"], 3
    )
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    print("| arm | min s | rows | buckets touched | max rows/bucket |", file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for label in ("control", "skewed"):
        r, s = out["runs"][label], out["source_shape"][label]
        print(
            f"| {label} | {r['min_sec']} | {r['rows_updated']} | "
            f"{r['buckets_touched']} | {s['max_rows_per_bucket']} |",
            file=sys.stderr,
        )
    print(f"skew wall ratio: {out['skew_ratio']}", file=sys.stderr)


if __name__ == "__main__":
    main()
