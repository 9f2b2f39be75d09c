"""Ordered-event sequence operators: conversion funnels and SCD2
(slowly-changing-dimension type 2) validity intervals.

Both answer "what happened to this key over time" questions the
reference's dashboard layer approximates with repeated filtered
aggregates (SURVEY.md §3.3); here each is ONE pass over the event log.

Scale shape: both operators are a single shuffle on the entity key —
the funnel is a groupBy(user_id) with conditional-min aggregates (no
window at all), the SCD2 build is one partitioned window. Neither
carries state beyond one row per (key, row); no global sort, no
driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from big_data_exercise_spark.functions.numeric import round_det

FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


def conversion_funnel(events: DataFrame) -> DataFrame:
    """Strict-order funnel over first-touch timestamps: a user counts
    for stage k iff their first timestamps of stages 0..k form a
    strictly increasing chain (the standard first-touch funnel
    approximation). Output: one row per stage with user count and
    conversion vs stage 0.
    """
    firsts = (
        events.filter(F.col("event_type").isin(FUNNEL_STAGES))
        .groupBy("user_id")
        .pivot("event_type", FUNNEL_STAGES)
        .agg(F.min("ts"))
    )
    reached = [F.col(FUNNEL_STAGES[0]).isNotNull()]
    for prev, cur in zip(FUNNEL_STAGES, FUNNEL_STAGES[1:]):
        reached.append(reached[-1] & (F.col(cur) > F.col(prev)))
    counts = firsts.agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"s{i}")
            for i, cond in enumerate(reached)
        ]
    )
    stack = ", ".join(
        f"{i}, '{name}', s{i}" for i, name in enumerate(FUNNEL_STAGES)
    )
    rows = counts.selectExpr(
        f"stack({len(FUNNEL_STAGES)}, {stack}) AS (stage_idx, stage, n_users)"
    )
    base = F.first("n_users").over(W.orderBy("stage_idx"))
    return rows.select(
        "stage_idx",
        "stage",
        "n_users",
        round_det(F.col("n_users") / base, 4).alias("conv_pct"),
    )


def scd2_intervals(events: DataFrame) -> DataFrame:
    """Event log → SCD2 history: one row per observation with
    (version, valid_from, valid_to, is_current); ``valid_to`` is NULL
    on each key's latest row — the open interval. This is the CDC →
    warehouse-history materialization every dimension pipeline runs.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select("user_id", "event_id", "ts", "value").select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("version"),
        F.col("value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: P(next type | current type), from lag pairs in one
    partitioned window pass + one small aggregation."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "event_type").agg(
        F.count("*").alias("n_transitions")
    )
    total = F.sum("n_transitions").over(W.partitionBy("prev_type"))
    return counts.select(
        "prev_type",
        "event_type",
        "n_transitions",
        round_det(F.col("n_transitions") / total, 4).alias("prob"),
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-activity week,
    distinct actives per (cohort_week, week_offset). Two shuffles
    total (first-touch agg keyed on user, then the cohort-cell
    distinct-count) — the shape scales because both keys are the
    natural partition keys."""
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        events.join(firsts, "user_id")
        .select(
            "cohort_week",
            "user_id",
            F.expr("CAST(datediff(ts, cohort_week) DIV 7 AS INTEGER)").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
