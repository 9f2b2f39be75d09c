"""The correctness gate, locally: every registry query with an oracle
is executed on Spark AND DuckDB at sf0.001 and compared
(column-sorted, row-sorted, float-tolerant) — the same check the
driver runs at sf0.01."""

from __future__ import annotations

import pytest

from big_data_exercise_spark.plans.registry import all_queries
from tests.conftest import SF_DIR, assert_frames_match

SPECS = all_queries()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, oracle):
    spec = SPECS[name]
    spark_df = spec.build(spark, SF_DIR)
    duck_df = oracle.sql(spec.oracle).df()
    assert_frames_match(spark_df, duck_df)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark):
    spec = SPECS[name]
    df = spec.build(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # every queries() key with an oracle_sql() entry, names consistent
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(SPECS)
