"""Central query registry: name → (spark callable, DuckDB oracle SQL).

Every operator claimed in SURVEY.md §2 registers here; ``__spark_entry__``
exposes the registry to the driver.  A query's Spark side takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle side is ANSI SQL
DuckDB runs on the same parquet tables (views pre-registered by the driver:
region nation customer supplier part orders lineitem events documents
embeddings).

Rules enforced by convention here (see tools/check_oracle.py):
- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded to a fixed number of decimals on
  both sides so double summation-order noise cannot flip the value hash;
- any LIMIT carries a total deterministic ORDER BY (tie-broken on a key).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: SparkQuery
    oracle: str | None  # None → driver runs weaker rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query-defining module (side effect: registration)."""
    from .queries import (  # noqa: F401
        analytics_ext,
        graph,
        ingest_demo,
        ingest_scaled,
        north_star,
        pipeline_demo,
        pipeline_ext,
        relational,
        scalars,
        search,
        tpch_ext,
    )

    return REGISTRY
