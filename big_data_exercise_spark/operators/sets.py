"""Set operators (SURVEY.md §2.7) — absent from the reference, filled
with built-ins: union/unionByName, intersect, exceptAll,
dropDuplicates.

Scale notes: INTERSECT/EXCEPT are hash aggregations on the full row —
at 100 TB always project to the key columns first (these functions
do), so the shuffle carries keys, not payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _users_of(events: DataFrame, event_type: str) -> DataFrame:
    return events.filter(F.col("event_type") == event_type).select("user_id")


def users_intersect(events: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """Users who did BOTH type_a and type_b (INTERSECT = distinct
    semi-join)."""
    return _users_of(events, type_a).intersect(_users_of(events, type_b))


def users_except(events: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """Users who did type_a but never type_b (EXCEPT DISTINCT —
    ``subtract`` is Spark's distinct set difference)."""
    return _users_of(events, type_a).subtract(_users_of(events, type_b))


def all_user_type_pairs(events: DataFrame) -> DataFrame:
    """dropDuplicates on a projection — the exact-dedup primitive that
    also backs dedup.exact (distinct (user, type) pairs)."""
    return events.select("user_id", "event_type").dropDuplicates()


def union_sources(a: DataFrame, b: DataFrame) -> DataFrame:
    """unionByName — schema-aligned append of two relations."""
    return a.unionByName(b)


def union_click_purchase_stats(events: DataFrame) -> DataFrame:
    """unionByName with allowMissingColumns (SET-u): click rows carry
    ``value``, purchase rows don't — missing columns null-fill, the
    union is by NAME (order-independent), and the aggregate skips the
    nulls. Per-user rollup over the combined relation."""
    from big_data_exercise_spark.functions.numeric import exact_sum

    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "value"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id"
    )
    combined = clicks.unionByName(purchases, allowMissingColumns=True)
    return combined.groupBy("user_id").agg(
        F.count("*").alias("n_rows"),
        F.count("value").alias("n_click_rows"),
        exact_sum(F.col("value")).alias("click_value"),
    )
