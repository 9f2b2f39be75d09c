"""Reshaping operators: explode / pivot / melt (SURVEY.md §2.8).

Reference occurrences:
* D1 explode — vehicle_consumer.py:171-176 (one row per detected
  vehicle type per frame);
* D2 long→wide pivot — consumer_postgres_streaming.py:391-393 does it
  manually with 8 regexp withColumns; we use the relational
  ``pivot`` with an explicit value list (explicit list = single pass,
  no extra job to discover pivot values — required at scale);
* D3 wide→long melt — streamlit_app.py:75-82 loops in pandas; we use
  the ``stack`` expression (no shuffle at all — melt is a projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from big_data_exercise_spark.functions.numeric import exact_sum


def explode_words(documents: DataFrame, k: int = 20) -> DataFrame:
    """Tokenize + explode + count: the D1 explode pattern applied to
    the documents corpus (word frequency top-k).

    explode is a narrow transformation (no shuffle); the only shuffle
    is the final word-count aggregation, which is map-side combined —
    at 100 TB the shuffle volume is |vocabulary| per input partition.
    """
    words = documents.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(k)
    )


def pivot_event_counts(events: DataFrame, types: list[str]) -> DataFrame:
    """Long→wide pivot with explicit value list (D2). One shuffle on
    user_id; the pivot itself is a projection over the grouped map.

    The explicit list is load-bearing at scale: ``pivot(col)`` without
    values makes Spark run a DISTINCT job over the pivot column first
    (an extra scan + a driver-side collect, capped at
    spark.sql.pivotMaxValues=10k). Schemas should not depend on data
    — for dynamic domains, compute the distinct list ONCE, review it,
    and pass it here."""
    wide = events.groupBy("user_id").pivot("event_type", types).count()
    cols = [F.col("user_id")] + [
        F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types
    ]
    return wide.select(*cols)


def melt_pricing(lineitem: DataFrame) -> DataFrame:
    """Wide→long melt via the stack() expression (D3): per returnflag,
    unpivot two aggregate measures into (measure, value) rows.
    stack is a pure projection — zero shuffle beyond the agg."""
    agg = lineitem.groupBy("l_returnflag").agg(
        exact_sum(F.col("l_quantity")).alias("sum_qty"),
        exact_sum(F.col("l_extendedprice")).alias("sum_price"),
    )
    return agg.selectExpr(
        "l_returnflag",
        "stack(2, 'sum_qty', sum_qty, 'sum_price', sum_price) AS (measure, value)",
    )


def word_positions(documents: DataFrame, max_doc_id: int = 10) -> DataFrame:
    """posexplode: one row per (doc, position, word) — the ordinal
    flatten (D1 variant) bounded to the first docs for a stable
    result."""
    from big_data_exercise_spark.functions.text import tokens

    return documents.filter(F.col("doc_id") < max_doc_id).select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "word")
    )


def event_count_map_roundtrip(events: DataFrame) -> DataFrame:
    """MapType surface: per-user event-type counts collected into a
    map<string,long> column (map_from_entries over collect_list), then
    exploded back to rows. The map is the useful API shape (one row
    per user, O(types) payload — what a feature store row looks like);
    the explode proves the roundtrip is lossless and gives the oracle
    plain rows to hash."""
    as_map = (
        events.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("event_type", "n")))
            ).alias("type_counts")
        )
    )
    return as_map.select(
        "user_id", F.explode("type_counts").alias("event_type", "n_events")
    )


def map_hof_roundtrip(events: DataFrame, min_count: int = 15) -> DataFrame:
    """Map higher-order functions: transform_values rescales counts,
    map_filter prunes low-frequency types, all inside the map column
    (codegen lambdas, no explode/regroup shuffle); the final explode
    exists only to give the oracle rows to hash."""
    as_map = (
        events.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("event_type", "n")))
            ).alias("m")
        )
    )
    doubled = F.transform_values(F.col("m"), lambda _, v: v * 2)
    pruned = F.map_filter(doubled, lambda _, v: v >= min_count * 2)
    return as_map.select(
        "user_id", F.explode(pruned).alias("event_type", "n_doubled")
    )
