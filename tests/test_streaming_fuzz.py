"""Differential fuzz for the streaming tier (round-8 judge item 4).

The batch oracle fuzz (test_oracle_fuzz.py) hammers the Spark/DuckDB
pairs with random corpora; the streaming equivalence tests
(test_streaming_multibatch.py) pin N=1 vs N=12 feed-width invariance
— but only on the fixture corpus. This lane closes the gap: RANDOM
event logs through the four latency-benched pipelines at N=1 vs N=12,
asserting the final emitted set is identical.

The generator plants the adversarial structure the fixture can't
deliver on demand:

* tie mass — a fixed pool of instants so equal event-times cluster
  inside windows and at range-split boundaries (repartitionByRange
  keeps equal keys together, so ties stress window/join multiplicity,
  not file order);
* hard watermark advancement — timestamps span 3 days against 1-hour
  windows and a 10-minute watermark, so a 12-file split advances the
  watermark by hours between micro-batches and state eviction runs
  mid-feed (the surface where multi-batch execution could genuinely
  diverge);
* empty micro-batches — corpora smaller than the feed width leave
  some range-split files empty; FileStreamSource still cycles them;
* one-sided streams — event_type is drawn from the full pool, so some
  corpora carry clicks but no purchases (the stream-stream joins'
  watermark then never advances: min of sides);
* fire-sampled ids — event_id mixes uniform draws with multiples of
  83 so the fire pipeline's `event_id % 83 = 0` sample is non-empty.

Deterministic: derandomize=True like the batch fuzz lanes (the CI
gate never discovery-flakes mid-round). Per-round exploration with
fresh seeds is SPARK_GRAFT_FUZZ_EXPLORE=<examples>, same knob as the
batch lanes.
"""

from __future__ import annotations

import math
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# round-12 suite budget: this whole module is a randomized
# exploration lane — default-skipped (see conftest), run in the
# exit gates with SPARK_GRAFT_FULL_TESTS=1.
pytestmark = pytest.mark.slow

from hypothesis import given, settings, strategies as st

from big_data_exercise_spark.streaming import pipelines as streams

N_FEED = 12

_EXPLORE = int(os.environ.get("SPARK_GRAFT_FUZZ_EXPLORE", "0"))


def _fuzz_settings(max_examples: int):
    if _EXPLORE:
        return settings(
            derandomize=False, max_examples=_EXPLORE, deadline=None
        )
    return settings(derandomize=True, max_examples=max_examples, deadline=None)

# 2024-01-01 + s seconds, µs — same epoch domain as the batch fuzz
_TS_UNIFORM = st.integers(min_value=0, max_value=3 * 24 * 3600).map(
    lambda s: 1704067200_000_000 + s * 1_000_000
)
# sub-second µs instants (round-8): the stream-stream left-outer
# emission rule keys on the MS-TRUNCATED max event time of each
# filtered side — whole-second inputs can never catch a truncation
# bug in that arithmetic, arbitrary-µs inputs can
_TS_MICRO = st.integers(min_value=0, max_value=3 * 24 * 3600 * 10**6).map(
    lambda u: 1704067200_000_000 + u
)
# planted tie instants: window edges and mid-window points
_TS_TIES = st.sampled_from(
    [1704067200_000_000 + s * 1_000_000
     for s in (0, 3600, 3600, 5400, 24 * 3600, 2 * 24 * 3600)]
)
_EVENT = st.tuples(
    st.one_of(
        st.integers(min_value=0, max_value=10**9),
        st.integers(min_value=0, max_value=10**6).map(lambda k: k * 83),
    ),                                                              # event_id
    st.one_of(_TS_UNIFORM, _TS_TIES, _TS_MICRO),                    # ts
    st.integers(min_value=0, max_value=6),                          # user_id
    st.sampled_from(["click", "view", "purchase", "signup", "error"]),
    st.one_of(
        st.integers(min_value=-(10**7), max_value=10**7).map(lambda n: n / 100),
        st.sampled_from([0.0, 100.0, 150.0, 150.0]),                # tie mass
    ),
    st.sampled_from(['{"k": 87}', '{"k": 0}', "{}"]),
)


def _write_events(rows) -> str:
    d = tempfile.mkdtemp(prefix="bdes_sfuzz_ev_")
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    return d


def _rows(df):
    pdf = df.toPandas()
    return sorted(
        tuple(
            None if isinstance(v, float) and math.isnan(v) else v
            for v in row
        )
        for row in pdf.itertuples(index=False, name=None)
    )


def _tumbling(spark, sf_dir):
    return streams.tumbling_counts(streams.stream_events(spark, sf_dir)), "complete"


def _ss_inner(spark, sf_dir):
    return (
        streams.click_purchase_attribution(
            streams.stream_events(spark, sf_dir),
            streams.stream_events(spark, sf_dir),
            watermark="10 minutes",
        ),
        "append",
    )


def _ss_left_outer(spark, sf_dir):
    return (
        streams.click_purchase_attribution(
            streams.stream_events(spark, sf_dir),
            streams.stream_events(spark, sf_dir),
            watermark="10 minutes",
            how="left_outer",
        ),
        "append",
    )


def _ss_inner_salted(spark, sf_dir):
    return (
        streams.click_purchase_attribution(
            streams.stream_events(spark, sf_dir),
            streams.stream_events(spark, sf_dir),
            watermark="10 minutes",
            salts=8,
        ),
        "append",
    )


def _ss_left_outer_salted(spark, sf_dir):
    return (
        streams.click_purchase_attribution(
            streams.stream_events(spark, sf_dir),
            streams.stream_events(spark, sf_dir),
            watermark="10 minutes",
            how="left_outer",
            salts=8,
        ),
        "append",
    )


def _fire(spark, sf_dir):
    from big_data_exercise_spark.multimodal import codecs

    return codecs.fire_mask_stats(streams.stream_events(spark, sf_dir)), "append"


PIPELINES = {
    "tumbling_complete": _tumbling,
    "stream_stream_inner": _ss_inner,
    "stream_stream_left_outer": _ss_left_outer,
    # hot-key mitigation twins (round 10): same fuzz surface, salted plan
    "stream_stream_inner_salted": _ss_inner_salted,
    "stream_stream_left_outer_salted": _ss_left_outer_salted,
    "fire_stateless": _fire,
}


def _run_at_width(spark, build, sf_dir, feed_files):
    if feed_files > 1:
        os.environ["SPARK_GRAFT_STREAM_FEED_FILES"] = str(feed_files)
    try:
        df, mode = build(spark, sf_dir)
        return _rows(streams.run_to_memory(df, mode))
    finally:
        os.environ.pop("SPARK_GRAFT_STREAM_FEED_FILES", None)


@pytest.mark.parametrize("name", sorted(PIPELINES))
def test_latency_pipeline_feed_width_invariance_random_logs(spark, name):
    build = PIPELINES[name]

    @_fuzz_settings(3)
    @given(
        rows=st.lists(_EVENT, min_size=1, max_size=40, unique_by=lambda r: r[0])
    )
    def run(rows):
        sf_dir = _write_events(rows)
        single = _run_at_width(spark, build, sf_dir, 1)
        multi = _run_at_width(spark, build, sf_dir, N_FEED)
        assert multi == single, (
            f"{name}: N={N_FEED} feed diverged from single batch on a "
            f"{len(rows)}-row random log"
        )

    run()


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_salted_join_equals_unsalted_on_random_logs(spark, how):
    """Salted-vs-unsalted plan parity under MULTI-batch execution on
    random logs — the eviction rule (left_outer) and the exactly-once
    pair meeting (inner) must survive the (user_id, salt) re-keying
    across watermark advancement, empty batches, and one-sided streams.
    The contract oracles pin this at sf0.01; this lane pins it on the
    adversarial generator."""

    def build(salts):
        def b(sp, sf_dir):
            return (
                streams.click_purchase_attribution(
                    streams.stream_events(sp, sf_dir),
                    streams.stream_events(sp, sf_dir),
                    watermark="10 minutes",
                    how=how,
                    salts=salts,
                ),
                "append",
            )

        return b

    @_fuzz_settings(3)
    @given(
        rows=st.lists(_EVENT, min_size=1, max_size=40, unique_by=lambda r: r[0])
    )
    def run(rows):
        sf_dir = _write_events(rows)
        unsalted = _run_at_width(spark, build(1), sf_dir, N_FEED)
        salted = _run_at_width(spark, build(8), sf_dir, N_FEED)
        assert salted == unsalted, (
            f"salted k=8 {how} join diverged from unsalted on a "
            f"{len(rows)}-row random log"
        )

    run()
