"""Driver-sample insurance (round-3 verdict item 7): every query on
bench.py's HEADLINE list executes end-to-end at sf0.001 through the
same noop-sink materialization the bench uses — an explicit named
gate so a refactor can't silently break the flagship tier between
rounds even if neither the driver's correctness sample nor the bench
happens to exercise it first."""

from __future__ import annotations

import pytest

from bench import HEADLINE
from big_data_exercise_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

SPECS = all_queries()


def test_headline_list_is_registry_valid():
    unknown = [n for n in HEADLINE if n not in SPECS]
    assert not unknown, f"bench HEADLINE names not in registry: {unknown}"


@pytest.mark.parametrize("name", HEADLINE)
def test_headline_query_executes(spark, name):
    df = SPECS[name].build(spark, SF_DIR)
    # noop sink materializes EVERY column, same as bench.py — count()
    # would let Catalyst prune the computed columns we mean to smoke.
    df.write.format("noop").mode("overwrite").save()
