"""Z-order (Morton-curve) clustering layout: multi-dimensional data
skipping for the lakehouse tier.

The layout family so far co-locates or prunes on ONE axis: bucketing
(operators/bucketing.py) hash-clusters a join key, day-partitioning
prunes a date, compaction fixes file granularity. But dashboard and
feature-store queries routinely filter on TWO columns at once
("this user band AND this value band", "this camera AND this hour"),
and a layout sorted on either column alone scatters the other across
every row group — min/max statistics prune nothing for the second
predicate. Interleaving the bits of both columns' normalized codes
(the public Morton/Z-curve construction, exposed by lakehouse table
formats as ``OPTIMIZE ... ZORDER BY``) makes rows close in BOTH
dimensions land together, so parquet row-group min/max stats become
selective for EITHER predicate and multiplicatively so for the
conjunction.

Scale shape: one pass to compute the z-value (pure integer bit
algebra, whole-stage codegen), one range shuffle on it, a sorted
write — the same one-time layout cost as bucketing, amortized over
every subsequent 2-D query. Reading back needs nothing special:
Spark's parquet reader prunes row groups from the pushed filters
(``PushedFilters`` in the scan, plan-test pinned), and the pyarrow
row-group-statistics test measures the prunability directly —
layout-level truth independent of which engine reads it.

The box-stats registry query is layout-INVARIANT by construction
(results identical however rows are arranged), so the DuckDB oracle
runs the same box aggregate over the raw table: a layout rewrite
that changed any value would hash-fail, the same discipline as
bucketing. Filter bounds are derived from the table's own min/max
(collected once — two scalar rows — and embedded as LITERALS so the
parquet scan can push them; a join-side bound would defeat the
pruning this layout exists for) with float arithmetic mirrored
exactly in the oracle's scalar subquery.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

BITS = 16
FILES = 64

_WRITTEN: dict[str, str] = {}


def _code(col, lo, hi, bits: int = BITS):
    """Normalize ``col`` into an integer code in [0, 2^bits): exact
    long arithmetic for the scale, clamped at the top edge, NULL → 0
    (nulls sort first — harmless for clustering)."""
    span = F.lit(float(hi) - float(lo))
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) / span * F.lit((1 << bits) - 1)
    ).cast("long")
    return F.coalesce(
        F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), scaled)), F.lit(0)
    )


def interleave_bits(xc, yc, bits: int = BITS):
    """Morton interleave of two integer codes: x's bit i → z bit 2i,
    y's bit i → z bit 2i+1. Pure bitwise Column algebra — 2·bits
    shift/and/or terms, one whole-stage-codegen expression."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def column_bounds(events: DataFrame) -> tuple[float, float, float, float]:
    """(user_lo, user_hi, value_lo, value_hi) as Python floats — one
    1-row collect, the literal-embedding exception that enables
    pushdown (same rationale as the IVF centroid resolve)."""
    r = events.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    return float(r[0]), float(r[1]), float(r[2]), float(r[3])


def write_zordered(
    events: DataFrame,
    out_dir: str,
    bounds: tuple[float, float, float, float],
    bits: int = BITS,
    files: int = FILES,
) -> str:
    """Rewrite ``events`` clustered on z(user_id, value): range
    shuffle on the z-value, z-sorted within partitions, one file per
    range so each file's row groups carry tight min/max on BOTH
    columns."""
    u_lo, u_hi, v_lo, v_hi = bounds
    z = interleave_bits(
        _code(F.col("user_id"), u_lo, u_hi, bits),
        _code(F.col("value"), v_lo, v_hi, bits),
        bits,
    )
    (
        events.withColumn("__z", z)
        .repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def write_sorted(events: DataFrame, out_dir: str, col: str = "value",
                 files: int = FILES) -> str:
    """Single-column-sorted comparison layout (what a naive ORDER BY
    rewrite produces): perfect stats on ``col``, scattered on
    everything else. Exists for the prunability A/B test."""
    (
        events.repartitionByRange(files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def _layout_for(spark: SparkSession, sf_dir: str, events: DataFrame) -> str:
    """pid-scoped, written-once-per-process layout dir (the bucketing
    module's isolation discipline)."""
    slug = re.sub(r"[^0-9a-zA-Z]+", "_", os.path.normpath(sf_dir)).strip("_").lower()
    out = os.path.join(
        tempfile.gettempdir(), f"bdes_zorder_p{os.getpid()}_{slug}"
    )
    if out not in _WRITTEN:
        write_zordered(events, out, column_bounds(events))
        _WRITTEN[out] = out
    return out


def box_bounds(bounds: tuple[float, float, float, float]) -> tuple[float, ...]:
    """The deterministic 2-D query box: fractional positions inside
    each column's observed range. Float expression order mirrors the
    oracle's scalar subquery term for term."""
    u_lo, u_hi, v_lo, v_hi = bounds
    return (
        u_lo + 0.30 * (u_hi - u_lo),
        u_lo + 0.55 * (u_hi - u_lo),
        v_lo + 0.20 * (v_hi - v_lo),
        v_lo + 0.45 * (v_hi - v_lo),
    )


def zorder_box_stats(spark: SparkSession, sf_dir: str, events: DataFrame) -> DataFrame:
    """2-D box aggregate over the z-ordered layout: both predicates
    reach the parquet scan as pushed literals and prune row groups on
    both columns at once. Results are layout-invariant (the oracle
    computes the same box over the raw table)."""
    from big_data_exercise_spark.functions.numeric import exact_sum

    bounds = column_bounds(events)
    u1, u2, v1, v2 = box_bounds(bounds)
    layout = spark.read.parquet(_layout_for(spark, sf_dir, events))
    return (
        layout.filter(
            F.col("user_id").between(F.lit(u1), F.lit(u2))
            & F.col("value").between(F.lit(v1), F.lit(v2))
        )
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
