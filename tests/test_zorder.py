"""Z-order layout tests: prunability measured from parquet row-group
statistics (layout-level truth, independent of which engine reads),
correctness invariance, and scan pushdown."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from big_data_exercise_spark.operators import layout as zorder
from big_data_exercise_spark.tables import load_table
from tests.conftest import SF_DIR


def _surviving_rows(layout_dir: str, u1, u2, v1, v2) -> tuple[int, int]:
    """(rows in row groups a 2-D box scan must read, total rows) from
    the files' own min/max statistics — exactly the skipping decision
    a stats-aware reader makes."""
    import pyarrow.parquet as pq

    must_read = total = 0
    for path in glob.glob(os.path.join(layout_dir, "*.parquet")):
        f = pq.ParquetFile(path)
        meta = f.metadata
        cols = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            total += rg.num_rows
            su = rg.column(cols["user_id"]).statistics
            sv = rg.column(cols["value"]).statistics
            if su is None or sv is None:
                must_read += rg.num_rows
                continue
            overlaps = not (
                su.max < u1 or su.min > u2 or sv.max < v1 or sv.min > v2
            )
            if overlaps:
                must_read += rg.num_rows
    return must_read, total


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """The point of the layout: for a 2-D box predicate, the z-ordered
    files' row-group stats must let a reader skip substantially more
    rows than a single-column sort (which is perfect on its own column
    and useless on the other). Measured from the actual parquet
    metadata, not from a plan string."""
    # sf0.01, not the usual sf0.001: prunability is a GRANULARITY
    # property (a contiguous z range at coarse depth spans whole
    # top-level quadrants), and 1000 rows cannot fill 256 granules.
    # 10k rows / 256 granules is the smallest honest measurement.
    events = load_table(spark, "/root/testdata/sf0.01", "events")
    bounds = zorder.column_bounds(events)
    u1, u2, v1, v2 = zorder.box_bounds(bounds)

    zdir = zorder.write_zordered(events, str(tmp_path / "z"), bounds, files=256)
    sdir = zorder.write_sorted(events, str(tmp_path / "s"), "value", files=256)

    z_read, z_total = _surviving_rows(zdir, u1, u2, v1, v2)
    s_read, s_total = _surviving_rows(sdir, u1, u2, v1, v2)
    assert z_total == s_total > 0
    # single-column sort prunes on value only → reads every granule the
    # value band touches; z-order additionally prunes the user band
    assert z_read < s_read, (z_read, s_read)
    assert z_read <= 0.7 * s_read, (z_read, s_read)
    # and the box itself is selective enough for the test to mean something
    assert s_read < s_total


def test_auto_code_picks_cutpoints_on_skew_and_prunes_better(spark, tmp_path):
    """Round-4 verdict item 7: the default code selection must sample
    skewness and switch to quantile cutpoints where linear codes die.
    Fixture: 1% outliers stretch value's range 1000× past the mass
    region, so the linear scale maps ~99% of rows into code cell 0 —
    a mass-region box then cannot prune on value at all.  Auto must
    (a) select equi_depth, (b) read no more granule rows than the
    linear layout for that box, and (c) stay layout-invariant."""
    n = 100_000
    outlier = F.col("id") % 100 == 0  # 1% of rows
    events = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 317).cast("long").alias("user_id"),
        F.when(outlier, (F.col("id") % 997).cast("double") * 1000.0)
        .otherwise((F.col("id") % 997).cast("double"))
        .alias("value"),
    )
    bounds = zorder.column_bounds(events)
    assert zorder.choose_zorder_code(events, bounds) == "equi_depth"
    # uniform data keeps the linear code (the cheap path)
    uniform = events.withColumn(
        "value", (F.col("event_id") % 997).cast("double")
    )
    assert (
        zorder.choose_zorder_code(uniform, zorder.column_bounds(uniform))
        == "linear"
    )

    # 256 granules: at 64 a curve block spans 32×32 code cells — too
    # coarse for a 40%×40% box to resolve (the same granularity note
    # as test_zorder_prunes_both_dimensions)
    adir = zorder.write_zordered(
        events, str(tmp_path / "auto"), bounds, files=256
    )  # default code='auto' → equi_depth here
    ldir = zorder.write_zordered(
        events, str(tmp_path / "lin"), bounds, files=256, code="linear"
    )
    # mass-region box: middle users × a value band inside the bulk
    u1, u2, v1, v2 = 95, 222, 200.0, 600.0
    a_read, a_total = _surviving_rows(adir, u1, u2, v1, v2)
    l_read, l_total = _surviving_rows(ldir, u1, u2, v1, v2)
    assert a_total == l_total == n
    assert a_read <= l_read, (a_read, l_read)
    assert a_read <= 0.7 * l_read, (a_read, l_read)  # a real win, not a tie

    box = lambda df: df.filter(  # noqa: E731
        F.col("user_id").between(u1, u2) & F.col("value").between(v1, v2)
    ).select("event_id", "user_id", "value")
    got, want = box(spark.read.parquet(adir)), box(events)
    assert got.exceptAll(want).union(want.exceptAll(got)).count() == 0


def test_zorder_results_are_layout_invariant(spark, tmp_path):
    """Clustering must never change results: the box rows read from
    the z-ordered copy equal the box rows from the raw table, row for
    row (the registry hash pins the aggregate; this pins the rows)."""
    events = load_table(spark, SF_DIR, "events")
    bounds = zorder.column_bounds(events)
    u1, u2, v1, v2 = zorder.box_bounds(bounds)
    zdir = zorder.write_zordered(events, str(tmp_path / "z"), bounds)
    box = lambda df: df.filter(  # noqa: E731
        F.col("user_id").between(F.lit(u1), F.lit(u2))
        & F.col("value").between(F.lit(v1), F.lit(v2))
    ).select("event_id", "user_id", "value")
    got = box(spark.read.parquet(zdir))
    want = box(events)
    assert got.exceptAll(want).union(want.exceptAll(got)).count() == 0


def test_zorder_box_predicates_are_pushed(spark):
    """Both box predicates must reach the parquet scan as pushed
    filters — a join-side or post-scan bound would defeat the
    row-group pruning the layout exists for."""
    from big_data_exercise_spark.plans.registry import all_queries

    df = all_queries()["zorder_box_stats"].build(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters:")[1][:400]
    assert "user_id" in pushed and "value" in pushed
    assert "GreaterThanOrEqual" in pushed and "LessThanOrEqual" in pushed


def test_interleave_bits_is_morton():
    """Spot-check the bit interleave against the arithmetic
    definition on a driver-side frame."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    rows = [(x, y) for x in (0, 1, 2, 3, 255) for y in (0, 1, 2, 3, 255)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        "x", "y", zorder.zvalue(F.col("x"), F.col("y"), 8).alias("z")
    )

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in df.collect():
        assert r.z == morton(r.x, r.y), (r.x, r.y, r.z)


def test_equi_depth_codes_beat_linear_on_skew(spark, tmp_path):
    """value is right-skewed, so linear min/max codes crowd most rows
    into a few low curve cells; equi-depth (quantile-cutpoint) codes
    must make the SAME box strictly more prunable at the same granule
    counts — including the coarse 32/64-granule regime where linear
    z-order loses to a plain 1-D sort."""
    events = load_table(spark, "/root/testdata/sf0.01", "events")
    bounds = zorder.column_bounds(events)
    u1, u2, v1, v2 = zorder.box_bounds(bounds)
    for files in (32, 64):
        qdir = zorder.write_zordered(
            events, str(tmp_path / f"q{files}"), bounds,
            bits=8, files=files, code="equi_depth",
        )
        ldir = zorder.write_zordered(
            events, str(tmp_path / f"l{files}"), bounds, files=files,
            code="linear",  # the A/B baseline (default 'auto' would
            # pick equi_depth here too — events.value is skewed)
        )
        q_read, q_total = _surviving_rows(qdir, u1, u2, v1, v2)
        l_read, l_total = _surviving_rows(ldir, u1, u2, v1, v2)
        assert q_total == l_total > 0
        assert q_read < l_read, (files, q_read, l_read)


def test_equi_depth_rejects_oversized_bits(spark, tmp_path):
    """bits > 8 in equi-depth mode must be rejected loudly, never
    silently clamped (the code resolution changes the prunability
    regime)."""
    import pytest

    events = load_table(spark, SF_DIR, "events")
    bounds = zorder.column_bounds(events)
    with pytest.raises(ValueError, match="at most 8 bits"):
        zorder.write_zordered(
            events, str(tmp_path / "x"), bounds, bits=16, code="equi_depth"
        )


def test_auto_code_clamps_bits_on_skew_without_error(spark, tmp_path):
    """Auto mode with bits > 8 stays legal: linear may win and use
    them all, and when the cutpoint code wins the layout clamps to 8
    bits/dimension (documented) instead of raising a data-dependent
    error. The written layout must still be readable and complete."""
    n = 20_000
    outlier = F.col("id") % 100 == 0
    events = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 317).cast("long").alias("user_id"),
        F.when(outlier, (F.col("id") % 997).cast("double") * 1000.0)
        .otherwise((F.col("id") % 997).cast("double"))
        .alias("value"),
    )
    bounds = zorder.column_bounds(events)
    out = zorder.write_zordered(
        events, str(tmp_path / "a10"), bounds, bits=10, files=16
    )
    assert spark.read.parquet(out).count() == n
