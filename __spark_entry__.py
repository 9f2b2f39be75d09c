"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``big_data_exercise_spark.plans.registry``: every
implemented operator from SURVEY.md §2 (plus the training-data
extensions) is one registry entry carrying both the Spark builder and
the DuckDB oracle SQL. Entries with ``oracle=None`` are the genuinely
non-SQL-expressible operators (heuristic language-ID, xxhash-based
SimHash) and get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_exercise_spark.plans.registry import all_queries
from big_data_exercise_spark.session import _pin_pythonpath, tune_session
from big_data_exercise_spark.tables import load_table

# This is an ENTRY SCRIPT (the driver's contract surface), not a
# library import: pin the repo root onto PYTHONPATH here so a driver
# that builds its SparkSession after importing us gets workers that
# can import this package by name. Library users are unaffected —
# importing big_data_exercise_spark itself mutates nothing; the pin
# otherwise happens inside session.get_spark().
_pin_pythonpath()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-shaped
    pricing summary (scan → pushed filter → partial+final hash agg →
    tiny sort)."""
    from big_data_exercise_spark.operators.aggregations import pricing_summary

    tune_session(spark)
    return pricing_summary(load_table(spark, "/root/testdata/sf0.001", "lineitem"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
