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
    # coalesce: a corpus with NO funnel-stage events leaves `firsts`
    # EMPTY, and a global SUM over an empty relation is NULL — but
    # "zero users reached stage k" is 0, which is what the oracle's
    # grouped count reports (random-corpus fuzz finding, round 7).
    counts = firsts.agg(
        *[
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"s{i}")
            for i, cond in enumerate(reached)
        ]
    )
    stack = ", ".join(
        f"{i}, '{name}', s{i}" for i, name in enumerate(FUNNEL_STAGES)
    )
    # ``counts`` is ONE row, so the funnel base (stage-0 count) rides
    # along the stack() projection — no window at all (a first_value
    # window here, even constant-keyed, funnels through a warned
    # single partition; a generator + sibling column does not).
    rows = counts.selectExpr(
        f"stack({len(FUNNEL_STAGES)}, {stack}) AS (stage_idx, stage, n_users)",
        "s0 AS _base",
    )
    return rows.select(
        "stage_idx",
        "stage",
        "n_users",
        round_det(F.col("n_users") / F.col("_base"), 4).alias("conv_pct"),
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


def common_event_paths(events: DataFrame, top: int = 20) -> DataFrame:
    """Top 3-step event paths (path mining): for every consecutive
    triple of one user's events (ordered by ts, event_id), the path
    string "a>b>c", counted corpus-wide — the next step up from the
    first-order transition matrix (event_transition_matrix), and the
    query behind "what do users do right before purchasing/erroring".

    One partitioned window (two leads) + one grouped count: the window
    never crosses users, the count is map-side combinable over at most
    |event_types|³ distinct paths, and the final top-k is a
    TakeOrderedAndProject. Deterministic tie-break on the path string
    so the limit cannot truncate arbitrarily."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = events.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        stepped.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(top)
    )


def session_peak_concurrency(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Peak concurrent sessions per day — the interval-analytics
    staple (capacity planning: "how many users were on AT ONCE").
    Sessions come from the same gap-based session_window as
    session_windows; the sweep-line turns each session into a (+1 at
    start, −1 at exclusive end) point and a running sum over the
    point stream reads off the concurrency step function; max per day
    is the peak. Tie order (t, delta) processes ends before starts at
    the same instant — exclusive-end semantics, engine-deterministic:
    within a peer group of equal (t, delta) the running values are a
    permutation of base+1..base+k, whose maximum is the full k
    regardless of peer order, so the daily MAX is stable.

    Scale shape: the sweep is PARTITIONED BY (DAY, HOUR) — each hour
    bucket runs its local (t, delta)-ordered running sum in a
    partitioned window, and each bucket inherits a carry (the count of
    sessions open at the top of that hour) assembled HIERARCHICALLY so
    no triangular join ever grows quadratic in the bucket count:

    * day carry — exclusive prefix of per-day delta totals over the
      one-row-per-day table (:func:`windows.broadcast_prefix_offsets`,
      O(#days²) comparisons on a tiny table, no window);
    * hour-within-day offset — exclusive prefix of per-hour totals
      WITHIN each day (:func:`windows.broadcast_grouped_prefix_offsets`
      — a hash join on the day with the hour inequality as residual,
      ≤ 24² comparisons per day).

    carry = day carry + hour offset, and carry + local running ≡ the
    global running sum because the global (t, delta) order visits hour
    buckets contiguously.  Versus the round-3 day-grain sweep this
    bounds the hottest task at ONE HOUR of one day's boundary stream
    (parallelism = active (day, hour) buckets, not #days), at the cost
    of a 24×-larger — still broadcast-tiny — totals table."""
    from pyspark.sql import Window as W

    from big_data_exercise_spark.operators.windows import (
        broadcast_grouped_prefix_offsets,
        broadcast_prefix_offsets,
    )

    # Materialization boundary (lazy checkpoint, GC-released): the
    # session table feeds the union (×2), the hour/day totals, both
    # prefix-offset builders, and the final sweep join — without it
    # Spark re-evaluates the session_window aggregation subtree once
    # per consumer (no cross-DAG CSE; the round-11 plan capture showed
    # 10 MergingSessions / 18 Exchanges for what is ONE session scan).
    sessions = (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("st"),
            F.col("w.end").alias("en"),
        )
        .localCheckpoint(eager=False)
    )
    pts = sessions.select(
        F.col("st").alias("t"), F.lit(1).alias("delta")
    ).unionAll(sessions.select(F.col("en").alias("t"), F.lit(-1).alias("delta")))
    pts = pts.withColumn("d", F.to_date("t")).withColumn(
        "hb", F.date_trunc("hour", F.col("t"))
    )
    hour_totals = pts.groupBy("d", "hb").agg(
        F.sum("delta").cast("long").alias("h_tot")
    )
    day_totals = hour_totals.groupBy("d").agg(
        F.sum("h_tot").cast("long").alias("d_tot")
    )
    day_carry = broadcast_prefix_offsets(day_totals, "d", "d_tot", "day_carry")
    hour_off = broadcast_grouped_prefix_offsets(
        hour_totals, ["d"], "hb", "h_tot", "h_off"
    )
    carries = (
        hour_off.join(F.broadcast(day_carry.select("d", "day_carry")), "d")
        .select(
            "d", "hb", (F.col("h_off") + F.col("day_carry")).alias("carry")
        )
    )
    w = (
        W.partitionBy("d", "hb")
        .orderBy("t", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run = pts.withColumn("c_local", F.sum("delta").over(w)).join(
        F.broadcast(carries.select("d", "hb", "carry")), ["d", "hb"]
    ).withColumn("c", F.col("c_local") + F.col("carry"))
    return (
        run.groupBy(F.to_date("t").cast("timestamp").alias("day"))
        .agg(
            F.max("c").cast("long").alias("peak_concurrency"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_sessions_started"),
        )
    )


def pit_feature_backfill(events: DataFrame) -> DataFrame:
    """Leakage-free point-in-time feature backfill — the feature-store
    join every supervised training pipeline needs: for each label event
    (purchase), the user's feature vector computed from STRICTLY
    PRIOR events only. Using any window that can see the label row (or
    later) leaks the future into training features; the frame here is
    ``ROWS UNBOUNDED PRECEDING .. 1 PRECEDING`` under the total order
    (ts, event_id), which makes the cutoff exact even for same-
    timestamp ties.

    Single pass, no per-label re-scan: instead of joining each label
    against its own history (quadratic in events-per-user), labels and
    feature events ride ONE user-partitioned window — the same tagged-
    union trick as joins.last_prior_event, generalized to a multi-
    column feature vector (activity count, click count, last observed
    value, tenure). Scale shape: one shuffle on user_id, linear per
    partition.
    """
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    featured = (
        events.select("event_id", "user_id", "ts", "event_type", "value")
        .withColumn("n_prior_events", F.count("*").over(w))
        .withColumn(
            "n_prior_clicks",
            F.coalesce(
                F.sum((F.col("event_type") == "click").cast("long")).over(w),
                F.lit(0),
            ),
        )
        .withColumn("last_value", F.last("value", ignorenulls=True).over(w))
        .withColumn("first_ts", F.min("ts").over(w))
    )
    return featured.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "n_prior_events",
        "n_prior_clicks",
        "last_value",
        (F.unix_micros("ts") - F.unix_micros("first_ts")).alias("tenure_us"),
    )
