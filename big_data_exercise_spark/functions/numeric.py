"""Deterministic numeric aggregation helpers.

Two distinct sources of cross-engine drift, both fixed here:

1. **Accumulation order.** Floating-point SUM/AVG are order dependent;
   Spark's partial aggregation order differs run-to-run and
   engine-to-engine. Fix: accumulate in DECIMAL(30,8) — exact,
   order-independent — and cast back to DOUBLE at the end.

2. **Rounding rule.** Engines disagree on ROUND(double) ties: Spark
   rounds the shortest decimal representation HALF_UP (BigDecimal), so
   a stored 20.274999…=="20.275" rounds to 20.28, while DuckDB rounds
   the scaled binary value (20.275*100 = 2027.4999… → 20.27). Fix: an
   explicit arithmetic rounding formula — floor(x·10^s + 0.5)/10^s for
   x ≥ 0, ceil(x·10^s − 0.5)/10^s for x < 0 (half away from zero) —
   built from IEEE ops both engines evaluate identically.

Cost note: decimal aggregation is marginally slower than double
(no SIMD), but the aggregate state is one 128-bit value per group —
at 100 TB this changes nothing about the shuffle shape. If exactness
is NOT required, plain double sums remain available via F.sum.

Domain boundary (found by the hypothesis fuzz, pinned in
tests/test_numeric_parity.py): the INPUT cast double→DECIMAL(30,8)
itself splits between engines at large magnitude.  Spark casts via
``BigDecimal.valueOf`` (exact for any double); DuckDB's column cast
scales by 10⁸ in DOUBLE arithmetic, whose ulp reaches 1 around
|v| ≈ 9·10⁷ — beyond that the cast itself goes inexact
(28125358491.0 → 28125358491.00000256), and already from |v| ≈ 10⁷
the scaled product's rounding can land a 17-significant-digit
adversarial double on the other side of a half-integer than Spark's
exact path (the fuzz's original counterexamples were exactly this
shape).  Empirically the engines agree bit-for-bit across the
small-magnitude double space (20k uniform draws, zero splits) and
PROVABLY on decimals of ≤ 6 fractional digits with |v| ≤ 10⁷ —
generously above every dataset column this engine ships (prices
~10⁵, values ≤ 10³); the hypothesis fuzz sweeps that domain and the
pin test demonstrates the magnitude boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(30,8)"


def round_det(col: Column, scale: int = 2) -> Column:
    """Engine-stable ROUND on a double: half away from zero, computed
    with explicit floor/ceil so any engine running the same IEEE ops
    gets the same bits.

    Non-finite transparency: Spark's FLOOR returns LONG, and the
    implicit double→long conversion silently maps NaN to 0 and
    saturates ±inf to ±Long.MAX (throwing under ANSI), while the
    DuckDB twin's FLOOR stays double and keeps NaN/inf — so without
    the guard a NaN input rounds to 0.0 on one engine and NaN on the
    other. The guard routes NaN and ±inf through untouched on both
    sides (round(NaN) = NaN, round(±inf) = ±inf is also the
    IEEE-sensible answer). The double cast inside the guard is a
    no-op for the double expressions this helper takes and keeps
    decimal inputs legal."""
    m = F.lit(float(10**scale))
    scaled = col * m
    rounded = (
        F.when(scaled >= 0, F.floor(scaled + F.lit(0.5)))
        .otherwise(F.ceil(scaled - F.lit(0.5)))
        .cast("double")
        / m
    )
    c = col.cast("double")
    non_finite = (
        F.isnan(c)
        | (c == F.lit(float("inf")))
        | (c == F.lit(float("-inf")))
    )
    return F.when(non_finite, c).otherwise(rounded)


def round_det_nn(col: Column, scale: int = 2) -> Column:
    """``round_det`` for provably NON-NEGATIVE FINITE inputs —
    bounded ratios like jaccard/containment (numerator ≥ 0,
    denominator ≥ 1, so the value is finite in [0, 1]).

    Why it exists: ``round_det`` references its argument ~6 times
    (the scaled value twice + the non-finite guard), and when a
    threshold filter over the rounded value is pushed into a JOIN
    CONDITION, Catalyst substitutes the argument expression per
    reference — an expensive argument (``array_intersect`` over token
    arrays) then re-evaluates up to 14× per joined row (measured +45%
    on the sf0.1 dedup closure). This form references its argument
    ONCE: exactly ``round_det``'s x ≥ 0 branch,
    floor(x·10^s + 0.5)/10^s — bit-identical on the stated domain,
    and the DuckDB twin (`round_det_sql`) takes the same branch for
    x ≥ 0. Out-of-domain behavior differs (NaN → 0.0, negatives take
    the wrong tie direction): callers assert the domain.
    """
    m = F.lit(float(10**scale))
    return F.floor(col * m + F.lit(0.5)).cast("double") / m


def round_det_sql(expr: str, scale: int = 2) -> str:
    """DuckDB twin of round_det (same IEEE ops, same bits).

    The ``+ 0.0`` normalizes SIGNED ZERO: Spark's FLOOR/CEIL return
    LONG (the double cast always yields +0.0), but DuckDB's CEIL
    returns DOUBLE, so a tiny negative input in (-0.5/m, 0) rounds to
    -0.0 there — value-equal, but ``%.9g`` hashes "-0" ≠ "0"
    (round-7 fuzz finding: a seasonal-decompose residual of -1.7e-18).
    IEEE -0.0 + 0.0 = +0.0; every other value (NaN/±inf included) is
    unchanged."""
    m = float(10**scale)
    return (
        f"((CAST(CASE WHEN ({expr}) * {m} >= 0 THEN FLOOR(({expr}) * {m} + 0.5) "
        f"ELSE CEIL(({expr}) * {m} - 0.5) END AS DOUBLE) + 0.0) / {m})"
    )


def exact_sum(col: Column, scale: int = 2) -> Column:
    """Order-independent, engine-stably-rounded SUM of a double expr.

    Non-finite inputs (NaN/±Inf — outside the documented numeric
    contract): Spark's non-ANSI double→decimal cast yields NULL, so
    they are silently EXCLUDED from the sum — the job never crashes
    on a dirty row (round-8 NaN probe: 0 Spark-side crashes across
    the whole events tier; DuckDB's cast raises instead, which is why
    the oracle fuzz domain excludes non-finite values). Callers that
    must *detect* non-finite rows should gate on isnan/isinf
    explicitly rather than rely on the sum."""
    return round_det(F.sum(col.cast(DEC)).cast("double"), scale)


def exact_avg(col: Column, scale: int = 2) -> Column:
    """Order-independent rounded AVG: exact decimal sum ÷ non-null
    count, divided in double (deterministic given exact inputs)."""
    return round_det(F.sum(col.cast(DEC)).cast("double") / F.count(col), scale)


def sum_sql(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB oracle twin of exact_sum."""
    inner = f"CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE)"
    return f"{round_det_sql(inner, scale)} AS {alias}"


def avg_sql(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB oracle twin of exact_avg."""
    inner = f"(CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE) / COUNT({expr}))"
    return f"{round_det_sql(inner, scale)} AS {alias}"
