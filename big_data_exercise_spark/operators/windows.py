"""Window-function operators (SURVEY.md §2.5).

Absent from the reference (no OVER(...) anywhere); its nearest analogs
are ORDER BY + LIMIT "most recent N" dashboard queries
(fire_detection_app.py:43-44) and post-hoc time bucketing. These
functions expose the idiomatic window surface.

Scale notes: a window partitioned by a key shuffles once on that key
and sorts within partitions — same cost envelope as a groupBy on the
key. Never use a global (unpartitioned) ORDER BY window at scale; all
functions here partition by user/key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """row_number() latest-row-per-key — 'latest frame per camera'
    re-expressed properly (the reference approximates this with
    ORDER BY detection_time DESC LIMIT n per dashboard refresh).

    Deterministic tie-break on event_id desc.
    """
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


def running_total_per_user(events: DataFrame) -> DataFrame:
    """Running SUM per user ordered by event time (rowsBetween
    unboundedPreceding..current) — running vehicle-count totals
    analog."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def inter_event_gap_ms(events: DataFrame) -> DataFrame:
    """lag() delta: milliseconds since the user's previous event.

    Millisecond epochs (unix_millis) rather than second-truncation so
    the value is exact and engine-independent.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_ms = F.unix_millis(F.col("ts"))
    return events.select(
        "user_id",
        "event_id",
        (ts_ms - F.lag(ts_ms).over(w)).alias("gap_ms"),
    )


def top_k_per_group(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k rows per group via rank over a partitioned window — the
    scalable form of 'top 50 counts per camera'
    (VEHICLE_COUNTING_GUIDE.md:85-95): one shuffle on the group key,
    no global sort."""
    w = W.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        events.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("event_type", "rk", "event_id", "user_id", F.round("value", 2).alias("value"))
    )


def value_ranks(events: DataFrame, top: int = 20) -> DataFrame:
    """dense_rank / percent_rank / ntile in one partitioned window —
    the ranking surface beyond row_number (W1-W4). percent_rank is
    (rank-1)/(n-1), an integer ratio both engines compute identically;
    ntile follows the SQL-standard ceil/floor bucket split. Bounded to
    the top ``top`` dense ranks per type for a stable result set."""
    from big_data_exercise_spark.functions.numeric import round_det

    w = W.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        events.select(
            "event_type",
            "event_id",
            F.dense_rank().over(w).alias("dr"),
            round_det(F.percent_rank().over(w), 6).alias("pr"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("dr") <= top)
    )


def user_first_last_events(events: DataFrame) -> DataFrame:
    """Frame-spec window surface: first_value / last_value / nth_value
    over an explicit UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING frame.
    The default frame (..CURRENT ROW) makes last_value return the
    current row — the classic window bug; the explicit full frame is
    the correct form, and since all three functions share ONE window
    spec Spark computes them in a single sort pass per user."""
    full = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        events.select(
            "user_id",
            "event_id",
            F.first("event_type").over(full).alias("first_type"),
            F.last("event_type").over(full).alias("last_type"),
            F.nth_value("event_type", 2).over(full).alias("second_type"),
        )
        .groupBy("user_id", "first_type", "last_type", "second_type")
        .agg(F.count("event_id").alias("n_events"))
    )


def trailing_hour_sums(events: DataFrame) -> DataFrame:
    """RANGE-framed window: per user, the running sum of values over
    the TRAILING HOUR of event time — the time-windowed aggregate
    rows-frames can't express (a rows frame counts rows, not time).
    The frame is anchored on epoch seconds; at scale this is the same
    single sort per user as any window, with state bounded by the
    hour's row count."""
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    from big_data_exercise_spark.functions.numeric import DEC, round_det

    return events.select(
        "user_id",
        "event_id",
        round_det(F.sum(F.col("value").cast(DEC)).over(w).cast("double"), 2).alias(
            "trailing_hour_value"
        ),
    )


def ntile_histogram(events: DataFrame, buckets: int = 10) -> DataFrame:
    """Per-group equi-height histogram via NTILE: within each
    event_type, rows are ranked by (value, event_id) — a total,
    deterministic order — and split into ``buckets`` equal-count
    bins; each bin reports its count and [lo, hi] value bounds.

    Scale note: the sort is PARTITIONED by event_type — the unbounded
    global-NTILE variant would funnel the whole table through one
    task. For a histogram over an unpartitioned 100 TB column, the
    scale path is approx_percentile cutpoints (see value_percentiles),
    not NTILE; this operator is the exact per-group form.
    """
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return (
        events.select("event_type", "event_id", "value")
        .withColumn("bucket", F.ntile(buckets).over(w))
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )
