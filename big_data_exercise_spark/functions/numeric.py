"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG are accumulation-order dependent; Spark's
partial aggregation order differs run-to-run and engine-to-engine, so
``ROUND(SUM(double), 2)`` can flip at a .xx5 boundary vs the DuckDB
oracle. Fix: accumulate in DECIMAL(30,8) — exact, order-independent —
and cast back to DOUBLE at the end. The per-row arithmetic feeding the
cast (e.g. price*(1-discount)) is a single IEEE operation, identical
on any engine; only the reduction order varied, and decimal removes
that.

Cost note: decimal aggregation is marginally slower than double
(no SIMD), but the aggregate state is one 128-bit value per group —
at 100 TB this changes nothing about the shuffle shape. If exactness
is NOT required, plain double sums remain available via F.sum.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(30,8)"


def exact_sum(col: Column, scale: int = 2) -> Column:
    """Order-independent rounded SUM of a double expression."""
    return F.round(F.sum(col.cast(DEC)).cast("double"), scale)


def exact_avg(col: Column, scale: int = 2) -> Column:
    """Order-independent rounded AVG: exact decimal sum ÷ non-null
    count, divided in double (deterministic given exact inputs)."""
    return F.round(F.sum(col.cast(DEC)).cast("double") / F.count(col), scale)


def sum_sql(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB oracle twin of exact_sum."""
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE), {scale}) AS {alias}"
    )


def avg_sql(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB oracle twin of exact_avg."""
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE) "
        f"/ COUNT({expr}), {scale}) AS {alias}"
    )
