"""Spark 4 Python DataSource for analysis JSON — the modern extension
point for custom sources (pyspark.sql.datasource), complementing the
schema-on-read JSON path in sources/json_source.py.

Why both exist: `read_analysis_json` (S1-S3) is the production path —
Spark's native JSON reader with an explicit schema, JVM-side parsing,
predicate pushdown.  This DataSource demonstrates the OTHER contract a
source can fulfil: arbitrary Python parsing logic behind a real
`spark.read.format(...)` surface, with file-level partition planning
(one InputPartition per analysis file → parallel reads, stable row
provenance).  The use case at 100 TB is formats Spark cannot parse
natively (proprietary binary-analysis dumps, protobuf streams): the
partition planner stays file-granular, each executor parses its own
files, and no driver-side parsing ever happens.

The reader emits the FUNCTION rows of each document verbatim (no UID
derivation — that is operators/ingest.py's job), so the oracle is a
static VALUES table of the fixture's raw function entries.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "binary_hash string, fn_name string, address string, size bigint, source_file string"


class AnalysisJsonDataSource(DataSource):
    """`spark.read.format("analysis_json_py").option("path", dir)` —
    one partition per *.json file."""

    @classmethod
    def name(cls) -> str:
        return "analysis_json_py"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "AnalysisJsonReader":
        return AnalysisJsonReader(self.options)


class AnalysisJsonReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("analysis_json_py requires option 'path'")

    def partitions(self):
        # file-granular planning: the DRIVER only lists names; all
        # parsing happens executor-side in read()
        files = sorted(str(p) for p in Path(self._path).glob("*.json"))
        return [InputPartition(f) for f in files]

    def read(self, partition):
        f = partition.value
        doc = json.loads(Path(f).read_text())
        info = doc.get("binary_info", {})
        hashes = info.get("hashes", {})
        bhash = hashes.get("sha256") or hashes.get("SHA256") or ""
        for fn in doc.get("functions", []):
            size = fn.get("size")
            yield (
                bhash,
                fn.get("name", ""),
                str(fn.get("address", "")),
                int(size) if size is not None else None,
                Path(f).name,
            )


def register_analysis_datasource(spark) -> None:
    """Idempotent registration (re-register is a no-op overwrite)."""
    spark.dataSource.register(AnalysisJsonDataSource)


# ------------------------------------------------- streaming Python source

FEED_TOTAL = 60
FEED_BATCH = 20

FEED_SCHEMA = "seq bigint, user_id bigint, amount_cents bigint"


def _feed_row(i: int) -> tuple[int, int, int]:
    """Deterministic synthetic feed row (the oracle replays the same
    formula from a range table)."""
    return (i, i % 7, (i * 37) % 1000)


class EventFeedStreamReader(SimpleDataSourceStreamReader):
    """Bounded deterministic feed: offsets are plain row counters, each
    ``read`` serves one batch and advances, and past ``FEED_TOTAL`` the
    offset stops moving (the drain-loop termination signal).
    ``readBetweenOffsets`` replays any committed range exactly —
    the contract that makes restart recovery exactly-once."""

    def initialOffset(self):
        return {"v": 0}

    def read(self, start):
        s = start["v"]
        if s >= FEED_TOTAL:
            return (iter([]), {"v": s})
        e = min(s + FEED_BATCH, FEED_TOTAL)
        return (iter([_feed_row(i) for i in range(s, e)]), {"v": e})

    def readBetweenOffsets(self, start, end):
        return iter([_feed_row(i) for i in range(start["v"], end["v"])])


class EventFeedDataSource(DataSource):
    """`spark.readStream.format("event_feed_py").load()` — a pure-Python
    STREAMING source (Spark 4 SimpleDataSourceStreamReader): the driver
    prefetches batches and tracks offsets; replay between committed
    offsets is deterministic, so file-sink + checkpoint = exactly-once
    across restarts. The 100 TB use case is the same as the batch
    DataSource: feeds Spark cannot consume natively (message queues
    behind Python SDKs, proprietary change feeds)."""

    @classmethod
    def name(cls) -> str:
        return "event_feed_py"

    def schema(self) -> str:
        return FEED_SCHEMA

    def simpleStreamReader(self, schema) -> "EventFeedStreamReader":
        return EventFeedStreamReader()


def register_event_feed_datasource(spark) -> None:
    spark.dataSource.register(EventFeedDataSource)
