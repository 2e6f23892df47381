"""Lineage AND statistics cutting for iterative DataFrame loops.

``localCheckpoint(eager=True)`` cuts the execution lineage, but Spark's
``LogicalRDD`` deliberately CARRIES OVER the origin plan's size
statistics (``originStats``) so the optimizer keeps making informed
broadcast decisions after a checkpoint.  For a loop whose per-round
plan JOINS several frames that are themselves products of the previous
round, that carry-over compounds multiplicatively: sizeInBytes is a
BigInt product over join children (Catalyst's
``SizeInBytesOnlyStatsPlanVisitor``), so its BIT LENGTH grows ~k× per
round (k = joins per round).  Measured on the pivot FW-BW shape: 47 →
194 → 783 → 3135 → 12547 bits over five rounds — by round ~12 the
stats are hundred-megabit BigIntegers and PLANNING (not execution)
pins a core for minutes inside ``BigInteger.multiplyToomCook3``.

:func:`checkpoint_cut` therefore rebuilds the checkpointed result as a
fresh ``LogicalRDD`` WITHOUT origin stats (sizeInBytes resets to
``spark.sql.defaultSizeInBytes``): one ``toRdd()`` handle on the
already-materialized checkpoint — no recompute, no Python round-trip —
then ``internalCreateDataFrame`` over the same JVM rows.  The traded
cost is the optimizer seeing "unknown (huge) size" instead of the
compounded estimate, i.e. no auto-broadcast of loop frames — which the
compounded estimates (astronomically large) never allowed either, and
which AQE re-derives at runtime from ACTUAL shuffle sizes.  Linear
accumulator loops (plain BFS frontiers: one join per level, bits grow
additively) don't need this; use it where the per-round plan is a
PRODUCT of several previous-round frames (FW-BW partition refinement,
anything join-recursive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_cut(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint + statistics reset (see module docstring).

    Falls back to the plain checkpoint if the private JVM hook is
    unavailable (non-classic sessions, future Spark versions) —
    correctness never depends on the stats cut."""
    cp = df.localCheckpoint(eager=True)
    try:
        spark = cp.sparkSession
        jdf = cp._jdf
        jrdd = jdf.queryExecution().toRdd()  # checkpointed scan — no recompute
        njdf = spark._jsparkSession.internalCreateDataFrame(jrdd, jdf.schema(), False)
        return DataFrame(njdf, spark)
    except Exception:
        return cp
