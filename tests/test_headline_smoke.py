"""Driver-sample insurance (round-3 verdict item 7): every query on
bench.py's HEADLINE list executes end-to-end at sf0.001 through the
same noop-sink materialization the bench uses — an explicit named
gate so a refactor can't silently break the flagship tier between
rounds even if neither the driver's correctness sample nor the bench
happens to exercise it first."""

from __future__ import annotations

import pytest

from bench import HEADLINE, LATENCY_QUERIES, SHARED50
from big_data_exercise_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

SPECS = all_queries()


def test_headline_list_is_registry_valid():
    unknown = [n for n in HEADLINE if n not in SPECS]
    assert not unknown, f"bench HEADLINE names not in registry: {unknown}"


def test_bench_sublists_are_consistent():
    """shared50_total and the latency pass only make sense over names
    the headline loop actually times/runs: SHARED50 must be the exact
    50-query r04 ratchet set and both lists must be HEADLINE subsets
    (a rename in one place would silently zero the ratchet)."""
    assert len(SHARED50) == 50 and len(set(SHARED50)) == 50
    missing = [n for n in SHARED50 if n not in HEADLINE]
    assert not missing, f"SHARED50 names not benched: {missing}"
    lat_missing = [n for n in LATENCY_QUERIES if n not in HEADLINE]
    assert not lat_missing, f"latency names not benched: {lat_missing}"


@pytest.mark.parametrize("name", HEADLINE)
def test_headline_query_executes(spark, name):
    df = SPECS[name].build(spark, SF_DIR)
    # noop sink materializes EVERY column, same as bench.py — count()
    # would let Catalyst prune the computed columns we mean to smoke.
    df.write.format("noop").mode("overwrite").save()
