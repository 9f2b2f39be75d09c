"""Time-series resampling: bucket → gap-fill → interpolate.

The hypertable-style rollup surface (continuous-aggregate analog):
the reference's dashboards bucket event streams by wall-clock time
(SURVEY.md §2.3 A3, consumer_postgres_streaming.py time_bucket
usage); this module adds the part SQL engines usually leave to the
application — materializing EMPTY buckets between observations and
linearly interpolating through them, which training-data and
monitoring pipelines both need (regular time grids for windowed
features).

Scale design:
* The grid is generated per key with ``sequence(min_h, max_h)`` —
  the explode multiplies rows but stays partition-local (no shuffle
  beyond the per-key agg that computed the bounds).
* Fill + interpolation are two frame-bounded window passes over
  (key, hour) — partitioned by key, never a global sort.
* The bucket aggregate uses exact decimal sums (functions.numeric)
  so the interpolation arithmetic starts from engine-identical
  doubles; the interpolation formula itself is plain IEEE ops both
  engines evaluate bit-for-bit.
* Grid density is bounded by the key's observed time span; a key
  with a pathological span (one event in 1990, one in 2030) makes a
  350k-row grid — at 100 TB, cap the span or bucket coarser
  (the ``max_span_hours`` guard here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from big_data_exercise_spark.functions.numeric import DEC, round_det


def resample_interpolate(
    events: DataFrame, max_span_hours: int = 24 * 366
) -> DataFrame:
    """Per-user hourly resample of ``value``: average within observed
    buckets, linear interpolation across missing interior buckets,
    nearest-edge fill at the boundaries (unreachable here — grid
    bounds are observed buckets — but kept for totality).

    Returns (user_id, bucket, observed, filled_value).
    """
    h = F.floor(F.col("ts").cast("long") / 3600).cast("long")
    hourly = (
        events.select("user_id", h.alias("h"), "value")
        .groupBy("user_id", "h")
        .agg(
            round_det(
                F.sum(F.col("value").cast(DEC)).cast("double") / F.count("value"), 4
            ).alias("val")
        )
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.filter(F.col("h1") - F.col("h0") < max_span_hours).select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    g = grid.join(hourly, ["user_id", "h"], "left")

    w_prev = W.partitionBy("user_id").orderBy("h").rowsBetween(
        W.unboundedPreceding, -1
    )
    # "next observed" is expressed as last-over-UNBOUNDED-PRECEDING on
    # the DESCENDING hour ordering, NOT first-over-(1, UNBOUNDED
    # FOLLOWING): a trailing frame grows incrementally (O(n) per
    # partition) while Spark's UnboundedFollowingWindowFunctionFrame
    # re-aggregates the remainder of the partition for EVERY row —
    # O(n²) per key. Found by the round-10 sf1 sweep: the interpolation
    # pass over a 10.5M-row grid sat >15 min in that frame (one task
    # pinned, stage-5 stack in UnboundedFollowingWindowFunctionFrame.
    # write); the descending twin is semantically identical (the last
    # non-null at smaller descending rank IS the first non-null
    # following hour) and costs one extra partition-local sort.
    w_next = W.partitionBy("user_id").orderBy(F.desc("h")).rowsBetween(
        W.unboundedPreceding, -1
    )
    obs_h = F.when(F.col("val").isNotNull(), F.col("h"))
    prev_val = F.last("val", ignorenulls=True).over(w_prev)
    prev_h = F.last(obs_h, ignorenulls=True).over(w_prev)
    next_val = F.last("val", ignorenulls=True).over(w_next)
    next_h = F.last(obs_h, ignorenulls=True).over(w_next)

    interp = prev_val + (next_val - prev_val) * (
        (F.col("h") - prev_h) / (next_h - prev_h)
    )
    filled = (
        F.when(F.col("val").isNotNull(), F.col("val"))
        .when(prev_val.isNotNull() & next_val.isNotNull(), round_det(interp, 4))
        .when(prev_val.isNotNull(), prev_val)
        .otherwise(next_val)
    )
    return g.select(
        "user_id",
        F.timestamp_seconds(F.col("h") * 3600).alias("bucket"),
        F.col("val").isNotNull().alias("observed"),
        filled.alias("filled_value"),
    )


def decayed_value_by_type(
    events: DataFrame,
    anchor: str = "2024-02-01",
    half_life_days: int = 7,
) -> DataFrame:
    """Half-life time-decayed aggregation: each event's value is
    weighted by 2^-(floor(age_days / half_life)) relative to a fixed
    ``anchor`` date — the recency weighting every event-scoring /
    feature pipeline eventually needs (recent activity dominates,
    history decays geometrically but never vanishes).

    Exactness contract: the decay uses WEEKLY HALVINGS (an integer
    power of two), so every weight is an exact dyadic rational and
    ``value * weight`` is a pure exponent shift — no rounding enters
    before the decimal-exact sum (functions.numeric). A continuous
    exp(-λ·age) decay would not be cross-engine reproducible (libm
    exp differs in the last ulp between engines); the stepped decay is
    the engine-stable formulation of the same idea. At scale this is
    one partial-aggregated shuffle, identical to any grouped sum; the
    anchor pins results regardless of when the job runs (never use
    current_timestamp() in a reproducible pipeline).

    Events AFTER the anchor carry weight 1 — halvings clamp at 0, so
    the future never AMPLIFIES (a negative age would double weekly:
    an event 316 days past the anchor would weigh 2^46, pushing
    value*weight ~1e15, outside the cross-engine decimal-conversion
    exactness domain documented in functions.numeric — a live
    divergence the round-8 events fuzz found once its generator
    crossed the anchor).

    NULL event time carries weight 1, by construction: age_days is
    NULL, and both Spark's greatest() and DuckDB's GREATEST() SKIP
    NULL arguments, so the clamp resolves greatest(NULL, 0) = 0
    halvings. "Unknown time = no decay" is the deliberate policy
    (an event whose timestamp was lost is still an event; silently
    zeroing it would understate totals) — anyone wanting exclusion
    filters ts IS NOT NULL upstream on both engines."""
    from big_data_exercise_spark.functions.numeric import exact_sum

    age_days = F.datediff(F.lit(anchor).cast("date"), F.col("ts").cast("date"))
    halvings = F.greatest(
        F.floor(age_days / F.lit(float(half_life_days))), F.lit(0)
    )
    weight = F.lit(1.0) / F.pow(F.lit(2.0), halvings.cast("double"))
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value") * weight, 4).alias("decayed_value"),
            exact_sum(F.col("value"), 4).alias("raw_value"),
        )
    )


def daily_active_windows(events: DataFrame) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the product
    analytics staple ("weekly active users") computed the scale-right
    way: instead of a day-grid range join (whose probe side re-scans
    the event log per day), every event row fans out to the ≤7 window
    days it participates in via a bounded ``sequence`` explode, and one
    distinct aggregation per day does the rest. Fanout is a constant
    (the window length), the only shuffle is the final groupBy(day),
    and COUNT(DISTINCT) stays exact — swap in approx_count_distinct at
    100 TB for the mergeable-sketch version (hll_reach_report shows
    that path). Output days are restricted to days with ≥1 event (the
    dashboard convention)."""
    from big_data_exercise_spark.functions.numeric import round_det

    ev = events.select(
        F.to_date("ts").alias("d"), "user_id"
    )
    days = ev.select(F.col("d").alias("day")).distinct()
    expanded = ev.select(
        "user_id",
        "d",
        F.explode(
            F.expr("sequence(d, date_add(d, 6), interval 1 day)")
        ).alias("day"),
    ).withColumn("offset", F.datediff("day", "d"))
    per_day = (
        expanded.join(days, "day")
        .groupBy("day")
        .agg(
            F.count_distinct(
                F.when(F.col("offset") == 0, F.col("user_id"))
            ).alias("dau_users"),
            F.count_distinct("user_id").alias("wau_users"),
        )
    )
    # Emit the day as a timestamp (repo convention for temporal output
    # columns): DATE round-trips as python date on the Spark side but
    # pandas Timestamp from DuckDB, so a DATE output column would
    # stringify differently in the comparators.
    return per_day.select(
        F.col("day").cast("timestamp").alias("day"),
        "dau_users",
        "wau_users",
        round_det(F.col("dau_users") / F.col("wau_users"), 4).alias(
            "stickiness"
        ),
    )


# Wilson 95% lower bound; ONE formula text parsed by BOTH engines
# (Spark F.expr and DuckDB) — identical parse tree → identical IEEE
# evaluation order. Constants are literal doubles (z = 1.96,
# z² = 3.8416), explicitly cast because a bare decimal literal parses
# as DECIMAL in Spark but DOUBLE in DuckDB.
WILSON_LOW = (
    "((p + CAST(3.8416 AS DOUBLE) / (2.0 * nd)"
    " - CAST(1.96 AS DOUBLE) * sqrt(p * (1.0 - p) / nd"
    " + CAST(3.8416 AS DOUBLE) / (4.0 * nd * nd)))"
    " / (1.0 + CAST(3.8416 AS DOUBLE) / nd))"
)


def daily_conversion_wilson(events: DataFrame) -> DataFrame:
    """Daily conversion rate with a Wilson-score 95% lower bound — the
    statistically honest dashboard number: a day with 2/3 users
    converting is NOT a 67%-conversion day, and the Wilson bound says
    so while converging to p̂ as n grows. k and n are exact distinct
    counts; the bound is a fixed chain of IEEE ops (sqrt is
    correctly-rounded by the standard), evaluated from the same
    formula text in both engines."""
    from big_data_exercise_spark.functions.numeric import round_det

    per_day = (
        events.select(
            F.to_date("ts").cast("timestamp").alias("day"),
            "user_id",
            (F.col("event_type") == "purchase").alias("is_p"),
        )
        .groupBy("day")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count_distinct(F.when(F.col("is_p"), F.col("user_id"))).alias(
                "n_converted"
            ),
        )
    )
    prepped = per_day.withColumn(
        "p", F.col("n_converted") / F.col("n_users")
    ).withColumn("nd", F.col("n_users").cast("double"))
    return prepped.select(
        "day",
        "n_users",
        "n_converted",
        round_det(F.col("p"), 4).alias("conversion_rate"),
        round_det(F.expr(WILSON_LOW), 4).alias("wilson_low_95"),
    )


def session_bounce_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Daily bounce rate: share of sessions containing exactly one
    event — the engagement-quality staple. Sessions from the same
    gap-based session_window as session_windows; one grouped count on
    top. Exact integer ratio, one IEEE division."""
    from big_data_exercise_spark.functions.numeric import round_det

    sessions = (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.to_date(F.col("w.start")).cast("timestamp").alias("day"),
            F.col("n_events"),
        )
    )
    return (
        sessions.groupBy("day")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bounces"),
        )
        .select(
            "day",
            "n_sessions",
            "n_bounces",
            round_det(F.col("n_bounces") / F.col("n_sessions"), 4).alias(
                "bounce_rate"
            ),
        )
    )


def seasonal_decompose_daily(events: DataFrame, half: int = 3) -> DataFrame:
    """Classical additive seasonal decomposition of the daily value
    series: value = trend + seasonal + residual.

    * **trend** — centered (2·half+1)-day moving average, expressed as
      an OFFSET SELF-JOIN (each day joins days d−half .. d+half via an
      exploded offset sequence) instead of a global-series window: the
      day table is grouped output, but the join form keeps the plan
      free of single-partition WindowExec at ANY series length, and
      the partial average at the series edges uses the observed
      neighbors only (the standard truncated-window convention).
    * **seasonal** — per-weekday mean of the detrended series, joined
      back by weekday (a 7-row broadcast).
    * **residual** — the leftover; by construction the three parts
      re-sum to the day's value exactly up to the two rounding points,
      which both engines share (round_det / its SQL twin).

    Everything is exact-decimal aggregation + deterministic IEEE
    division — fully oracle-replayable. Output: one row per day.
    """
    day_val = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast(DEC)).alias("dec_total"))
        .select("day", F.col("dec_total").cast("double").alias("day_value"))
    )
    offsets = F.sequence(F.lit(-half), F.lit(half))
    probe = day_val.select(
        F.col("day").alias("center_src"), "day_value"
    ).select(
        "center_src", "day_value", F.explode(offsets).alias("off")
    ).select(
        F.date_add(F.col("center_src"), F.col("off")).alias("day"),
        F.col("day_value").alias("neighbor_value"),
    )
    trend = (
        day_val.join(probe, "day")
        .groupBy("day", "day_value")
        .agg(
            round_det(
                F.sum(F.col("neighbor_value").cast(DEC)).cast("double")
                / F.count("*"),
                4,
            ).alias("trend")
        )
    )
    detrended = trend.withColumn("detr", F.col("day_value") - F.col("trend"))
    weekday = F.dayofweek("day").alias("wd")
    seasonal = (
        detrended.groupBy(weekday)
        .agg(
            round_det(
                F.sum(F.col("detr").cast(DEC)).cast("double") / F.count("*"), 4
            ).alias("seasonal")
        )
    )
    out = detrended.join(F.broadcast(seasonal), F.dayofweek("day") == F.col("wd"))
    return out.select(
        F.col("day").cast("timestamp").alias("day"),
        round_det(F.col("day_value"), 4).alias("day_value"),
        "trend",
        "seasonal",
        round_det(F.col("detr") - F.col("seasonal"), 4).alias("residual"),
    )
