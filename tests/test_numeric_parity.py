"""Cross-engine determinism of the rounding/aggregation kernel in
functions/numeric.py — the foundation every oracle-checked double
aggregate stands on. Spark evaluates round_det; DuckDB evaluates
round_det_sql; the bits must match on adversarial inputs (exact .xx5
ties, shortest-repr traps, negatives, large magnitudes)."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from big_data_exercise_spark.functions.numeric import round_det, round_det_sql

# Adversarial + pseudo-random values. 20.275 and 2.675 are the classic
# shortest-repr-vs-binary-scaling disagreement cases; 0.84375 is an
# exact dyadic tie; negatives exercise the half-away-from-zero branch.
ADVERSARIAL = [
    20.275, 2.675, 0.84375, -20.275, -2.675, -0.005, 0.005, 1.005,
    -1.005, 123456.789, -123456.789, 0.0, -0.0, 1e10 + 0.125,
]


def _pseudo_random(n=500, seed=1234567):
    vals, x = [], seed
    for _ in range(n):
        x = (1103515245 * x + 12345) % 2**31
        vals.append((x / 2**31 - 0.5) * 2000)
    return vals


def test_round_det_matches_duckdb(spark):
    values = ADVERSARIAL + _pseudo_random()
    sdf = spark.createDataFrame([(v,) for v in values], "v double")
    spark_out = [
        r.r
        for r in sdf.select(round_det(F.col("v"), 2).alias("r"))
        .toPandas()
        .itertuples(index=False, name="Row")
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": pd.Series(values, dtype="float64")}))
    duck_out = [
        r[0]
        for r in con.sql(f"SELECT {round_det_sql('v', 2)} AS r FROM t").fetchall()
    ]
    assert len(spark_out) == len(duck_out)
    for v, a, b in zip(values, spark_out, duck_out):
        assert a == b, f"round_det({v!r}): spark={a!r} duckdb={b!r}"


def test_round_det_half_away_from_zero(spark):
    sdf = spark.createDataFrame(
        [(0.125,), (-0.125,), (0.135,), (-0.135,)], "v double"
    )
    got = [
        r.r for r in sdf.select(round_det(F.col("v"), 2).alias("r")).collect()
    ]
    # 0.125 and 0.135 are exact (0.135 is not, its double is
    # 0.13500000000000001 > .135) — rounding is on the BINARY value.
    assert got[0] == 0.13 and got[1] == -0.13
    assert got[2] == 0.14 and got[3] == -0.14


def test_exact_aggregates_partitioning_invariant(spark):
    """The decimal-accumulate kernel exists to make double aggregates
    independent of accumulation order. Pin it: the same aggregation
    under 1-partition and heavily-over-partitioned layouts (different
    merge trees, different orders) must produce identical bits."""
    from big_data_exercise_spark.operators.aggregations import time_bucket
    from big_data_exercise_spark.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    one = {tuple(r) for r in time_bucket(ev.coalesce(1)).collect()}
    many = {tuple(r) for r in time_bucket(ev.repartition(37)).collect()}
    assert one == many


def test_round_det_sql_never_emits_negative_zero():
    """Signed-zero parity (round-7 fuzz catch): Spark's FLOOR/CEIL
    return LONG — the double cast yields +0.0 — while DuckDB's CEIL
    returns DOUBLE, so a tiny negative in (-0.5/m, 0) rounded to -0.0
    there and '%.9g' hashed "-0" != "0". round_det_sql normalizes with
    + 0.0; pin it across the boundary and the sign classes."""
    for v in (-1.7e-18, -1e-300, -0.0, 0.0, 1e-18, -0.00004, 0.00004):
        out = duckdb.sql(
            f"SELECT {round_det_sql(str(v), 4)} AS r"
        ).fetchall()[0][0]
        assert out == 0.0
        assert str(out) == "0.0", f"{v} -> {out!r} (signed zero leaked)"
    # negative values past the tie still round negative
    out = duckdb.sql(f"SELECT {round_det_sql('-0.00006', 4)} AS r").fetchall()[0][0]
    assert out == -0.0001


def test_round_det_hypothesis_fuzz(spark):
    """Property-based sweep of the kernel over its DOCUMENTED domain —
    decimals of ≤ 6 fractional digits with |v| ≤ 10⁷ (money,
    measurements — generously above every dataset column): Spark's
    decimal-accumulate + round_det must be bit-identical to DuckDB's
    round_det_sql twin for any such list and any scale 0-6.  The
    magnitude bound is BY CONTRACT (see functions/numeric.py 'Domain
    boundary' and the pin test below; an earlier unrestricted fuzz
    found it): DuckDB's double→decimal(30,8) column cast scales by
    10⁸ in DOUBLE arithmetic, so from |v| ≈ 10⁷ an adversarial
    17-significant-digit double can round across a half-integer the
    other way than Spark's exact BigDecimal path."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        xs=st.lists(
            st.integers(min_value=-(10**13), max_value=10**13).map(
                lambda n: n / 1e6
            ),
            min_size=1,
            max_size=40,
        ),
        scale=st.integers(min_value=0, max_value=6),
    )
    def run(xs, scale):
        sdf = spark.createDataFrame([(float(x),) for x in xs], "v double")
        got = sdf.agg(
            round_det(F.sum(F.col("v").cast("decimal(30,8)")).cast("double"), scale)
        ).collect()[0][0]
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"v": xs}))
        want = con.sql(
            f"SELECT {round_det_sql('CAST(SUM(CAST(v AS DECIMAL(30,8))) AS DOUBLE)', scale)} FROM t"
        ).fetchone()[0]
        assert got == want, (xs, scale, got, want)

    run()


def test_input_cast_divergence_is_pinned(spark):
    """The documented magnitude boundary, demonstrated on the path the
    kernel actually runs (a stored DOUBLE column — a SQL literal would
    parse as decimal directly and hide it): past |v| ≈ 9·10⁷ DuckDB's
    scale-by-10⁸-in-DOUBLE cast goes inexact while Spark's BigDecimal
    path stays exact.  If either engine changes its cast semantics
    this test fails and the numeric.py contract note must be
    rewritten."""
    import duckdb

    def duck_cast(v):
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"v": [v]}))
        return str(con.sql("SELECT CAST(v AS DECIMAL(30,8)) FROM t").fetchone()[0])

    def spark_cast(v):
        return str(
            spark.createDataFrame([(v,)], "v double")
            .select(F.col("v").cast("decimal(30,8)").alias("d"))
            .collect()[0][0]
        )

    big = 28125358491.0
    assert duck_cast(big) == "28125358491.00000256"
    assert spark_cast(big) == "28125358491.00000000"
    # and an in-domain value (≤ 6 fractional digits, |v| ≤ 1e7)
    # casts identically through both engines' column paths
    y = 1234567.890123
    assert duck_cast(y) == spark_cast(y) == "1234567.89012300"
    # and for an in-domain value (≤13 sig digits) the casts agree
    y = 1234567.890123
    s2 = (
        spark.createDataFrame([(y,)], "v double")
        .select(F.col("v").cast("decimal(30,8)").alias("d"))
        .collect()[0][0]
    )
    d2 = duckdb.sql(f"SELECT CAST({y!r} AS DECIMAL(30,8))").fetchone()[0]
    assert s2 == d2


def test_round_det_nan_and_special_values_match_duckdb(spark):
    """Non-finite transparency (round-6 finding): Spark's
    FLOOR(double)→LONG coercion silently rounded NaN to 0.0 and
    saturated ±inf to ±9.2e16 (both throw under ANSI) while DuckDB's
    FLOOR keeps NaN/inf — round_det now routes non-finite values
    through untouched on both engines."""
    import math

    values = [float("nan"), float("inf"), float("-inf"), 1.5, -2.5, None]
    sdf = spark.createDataFrame([(v,) for v in values], "v double")
    spark_out = [
        r.r for r in sdf.select(round_det(F.col("v"), 2).alias("r")).collect()
    ]
    assert math.isnan(spark_out[0])
    assert spark_out[1] == float("inf") and spark_out[2] == float("-inf")
    assert spark_out[3] == 1.5 and spark_out[4] == -2.5
    assert spark_out[5] is None

    con = duckdb.connect()
    con.register(
        "t_nan", pd.DataFrame({"v": pd.Series([float("nan")], dtype="float64")})
    )
    duck_nan = con.sql(
        f"SELECT {round_det_sql('v', 2)} AS r FROM t_nan"
    ).fetchall()[0][0]
    # pandas→duckdb keeps NaN as NaN (not NULL) for float64 columns
    assert duck_nan is None or math.isnan(duck_nan)
    if duck_nan is not None:
        assert math.isnan(spark_out[0]) and math.isnan(duck_nan)


def test_round_det_nn_equals_round_det_on_domain(spark):
    """round_det_nn is round_det's x >= 0 branch with ONE argument
    reference (the form safe to ride a pushed join-condition
    predicate). On its stated domain — non-negative finite doubles,
    the bounded ratios it is used for — the two must be bit-identical,
    and both must match the DuckDB twin (whose CASE takes the same
    branch for x >= 0)."""
    from big_data_exercise_spark.functions.numeric import round_det_nn

    values = [v for v in ADVERSARIAL if v >= 0] + [
        abs(v) for v in _pseudo_random(300)
    ] + [0.0, 1.0, 0.5, 0.79995, 0.799949999, 0.80005, 1.0 / 3.0]
    sdf = spark.createDataFrame([(v,) for v in values], "v double")
    for scale in (0, 2, 4, 6):
        out = sdf.select(
            round_det(F.col("v"), scale).alias("a"),
            round_det_nn(F.col("v"), scale).alias("b"),
        ).toPandas()
        pd.testing.assert_series_equal(
            out["a"], out["b"], check_names=False, check_exact=True
        )
        duck = duckdb.sql(
            "SELECT "
            + round_det_sql("v", scale)
            + " AS r FROM (SELECT unnest(?::DOUBLE[]) AS v)",
            params=[values],
        ).df()
        pd.testing.assert_series_equal(
            out["b"], duck["r"], check_names=False, check_exact=True
        )


def test_nonfinite_values_never_crash_and_are_excluded(spark):
    """Round-8 NaN/Inf probe, pinned: values outside the numeric
    contract (NaN, ±Inf) must never kill a job — Spark's non-ANSI
    double→decimal cast nulls them, so exact-decimal aggregates
    silently exclude them (documented in functions.numeric.exact_sum;
    DuckDB's cast raises, so the oracle fuzz domain stays finite)."""
    import math

    from big_data_exercise_spark.operators.aggregations import (
        conditional_agg,
        time_bucket,
        top_revenue,
    )

    rows = [
        (0, 1700006400000000, 0, "click", float("nan"), "{}"),
        (1, 1700006401000000, 1, "view", float("inf"), "{}"),
        (2, 1700006402000000, 2, "purchase", float("-inf"), "{}"),
        (3, 1700006403000000, 0, "click", 5.0, "{}"),
    ]
    import pandas as pd

    ev = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value",
                     "props"],
        ).astype({"ts": "datetime64[us]"})
    )
    # none of these may raise; the finite row aggregates normally
    top = top_revenue(ev).toPandas()
    clk = top[(top.user_id == 0) & (top.event_type == "click")]
    assert len(clk) == 1 and clk.total_value.iloc[0] == 5.0
    agg = conditional_agg(ev).toPandas().set_index("event_type")
    # click group: NaN excluded from the exact sum/avg path
    assert agg.loc["click", "n_events"] == 2
    # one hour bucket × 3 types (the two clicks collapse)
    tb = time_bucket(ev).toPandas()
    assert len(tb) == 3
