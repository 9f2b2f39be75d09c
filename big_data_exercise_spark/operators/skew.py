"""Skew-mitigation patterns (100 TB tooling).

AQE's skew-join splitting handles joins, but a skewed *aggregation*
key (one user with 10⁹ events) still funnels one group through one
task in the final stage. The classic fix is salted two-phase
aggregation: partial-aggregate on (key, salt) — the hot group spreads
over `salts` tasks — then finish on key. For algebraic aggregates
(sum/count/min/max, and avg via sum+count) the result is identical to
the direct aggregation, which is exactly what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from big_data_exercise_spark.functions.numeric import round_det


def salted_revenue(events: DataFrame, salts: int = 16, k: int = 50) -> DataFrame:
    """top_revenue computed with a salted two-phase aggregation —
    byte-identical results to the direct form (same decimal
    accumulation, same deterministic rounding), different shuffle
    shape: phase 1 shuffles on (user, type, salt) so no single task
    owns a hot key; phase 2 shuffles `salts` rows per group."""
    salted = events.withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(salts))
    )
    partial = salted.groupBy("user_id", "event_type", "salt").agg(
        F.sum(F.col("value").cast("decimal(30,8)")).alias("part_sum")
    )
    return (
        partial.groupBy("user_id", "event_type")
        .agg(round_det(F.sum("part_sum").cast("double"), 2).alias("total_value"))
        .orderBy(F.desc("total_value"), "user_id", "event_type")
        .limit(k)
    )
