"""Warehouse-backed MODEL STORE: trained artifacts as rows of the
keyed ``_models`` table.

A trained codebook (IVF centroids, PQ subspace books) is an INDEX
artifact: production persists it next to the data and queries reuse
it.  Before r10 the engine cached these as driver-local ``/tmp`` JSON
files — content-keyed and race-safe, but outside every durability
story.  This store makes the artifact a first-class warehouse row, so
it inherits the manifest protocol wholesale:

* **commit**: a ``put`` is an LWW ``merge_batch`` on ``name`` — the
  same optimistic-concurrency publish as any table write;
* **time travel**: old codebooks stay readable at their versions
  (``wh.read("_models", version=v)``);
* **vacuum**: expired artifact versions age out with everything else;
* **sharing**: a real cluster's executors and future sessions resolve
  the artifact through the warehouse root, not a driver's tempdir.

``content_key`` is the training-code-versioned content address: a
``get`` whose stored key mismatches returns None (stale artifact →
retrain), so a new training implementation invalidates old rows
automatically — the same device the old disk cache used, now durable.

Scale shape: artifacts are dimension-sized (a codebook is k·dim
floats), so one row per model and a broadcast-sized table; ``get`` is
a point read on the merge key (bucketed tables would prune to one
bucket; the flat `_models` table is a handful of KB).
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from .warehouse import Warehouse


class ModelStore:
    def __init__(self, spark: SparkSession, root: str):
        self.wh = Warehouse(spark, root)
        self.spark = spark

    def put(self, name: str, payload, *, kind: str, content_key: str) -> None:
        """Publish (or LWW-overwrite) a model artifact — one merge
        commit on the ``_models`` table."""
        from .warehouse import ALL_TABLES

        row = (name, kind, content_key, json.dumps(payload))
        df = self.spark.createDataFrame([row], ALL_TABLES["_models"][0])
        self.wh.merge_batch({"_models": df})

    def get(self, name: str, *, content_key: str):
        """The artifact's payload, or None when absent or stale
        (stored content_key differs — retrain and re-put)."""
        from pyspark.sql import functions as F

        try:
            rows = (
                self.wh.read("_models")
                .filter(F.col("name") == name)
                .limit(1)
                .collect()
            )
        except FileNotFoundError:
            return None
        if not rows or rows[0]["content_key"] != content_key:
            return None
        return json.loads(rows[0]["payload"])
