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


def user_days_except_all(events: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): per-occurrence subtraction —
    a user-day with 3 clicks and 1 purchase keeps 2 rows, where
    EXCEPT DISTINCT would drop it entirely. The multiset forms are
    the right semantics for event-frequency comparisons."""
    a = events.filter(F.col("event_type") == type_a).select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    b = events.filter(F.col("event_type") == type_b).select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    return a.exceptAll(b)


def user_days_intersect_all(events: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): min-of-multiplicities
    per (user, day) pair."""
    a = events.filter(F.col("event_type") == type_a).select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    b = events.filter(F.col("event_type") == type_b).select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    return a.intersectAll(b)
