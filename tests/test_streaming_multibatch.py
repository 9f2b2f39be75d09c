"""Multi-micro-batch feed equivalence (SPARK_GRAFT_STREAM_FEED_FILES).

The latency bench replays the streaming headline queries over a
ts-ordered N-file feed (N micro-batches) instead of the default
single-file read (1 batch). These lanes pin the claim that the feed
width is an *observability* knob, not a semantics knob: the final
emitted set must be identical at N=1 and N=12, including the two
surfaces where multi-batch execution could genuinely diverge —

* the watermarked stream-stream LEFT OUTER join, whose unmatched-row
  eviction happens progressively as the watermark advances between
  batches (ordered arrival guarantees no match is lost to early
  eviction: a purchase in batch k+1 has ts >= every batch-k event, so
  the min-of-sides watermark trails its join window);
* complete-mode windowed aggregation, whose state accumulates across
  batches.

Also asserts the feed actually produced one data-carrying batch per
file — the property the latency percentiles depend on.
"""

from __future__ import annotations

import math
import os

import pytest

from big_data_exercise_spark.streaming import pipelines as streams

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
N_FEED = 12


def _rows(df):
    pdf = df.toPandas()
    return sorted(
        tuple(
            None if isinstance(v, float) and math.isnan(v) else v
            for v in row
        )
        for row in pdf.itertuples(index=False, name=None)
    )


def _run(spark, build, mode, feed_files=None, monkeypatch=None):
    if feed_files:
        monkeypatch.setenv("SPARK_GRAFT_STREAM_FEED_FILES", str(feed_files))
    else:
        assert os.environ.get("SPARK_GRAFT_STREAM_FEED_FILES") is None
    try:
        out = streams.run_to_memory(build(spark), mode)
        return _rows(out), len(streams.LAST_BATCH_MS)
    finally:
        if feed_files:
            monkeypatch.delenv("SPARK_GRAFT_STREAM_FEED_FILES")


def _tumbling(spark):
    return streams.tumbling_counts(streams.stream_events(spark, SF_DIR))


def _ss_left_outer(spark):
    return streams.click_purchase_attribution(
        streams.stream_events(spark, SF_DIR),
        streams.stream_events(spark, SF_DIR),
        watermark="10 minutes",
        how="left_outer",
    )


def _fire_stream(spark):
    # stateless append pipeline with the real PNG codec in the
    # micro-batch — the third mode class of the latency bench set
    from big_data_exercise_spark.multimodal import codecs

    return codecs.fire_mask_stats(streams.stream_events(spark, SF_DIR))


@pytest.mark.parametrize(
    "build,mode",
    [
        (_tumbling, "complete"),
        (_ss_left_outer, "append"),
        (_fire_stream, "append"),
    ],
    ids=["tumbling_complete", "stream_stream_left_outer", "fire_stateless"],
)
def test_multibatch_feed_equals_single_batch(spark, monkeypatch, build, mode):
    single, n_single = _run(spark, build, mode)
    multi, n_multi = _run(
        spark, build, mode, feed_files=N_FEED, monkeypatch=monkeypatch
    )
    assert multi == single
    # every feed file became its own data-carrying micro-batch — the
    # property that turns the latency p50/p95 into real order stats
    assert n_multi >= N_FEED > n_single


def test_feed_restart_recovers_exactly_once(spark, monkeypatch, tmp_path):
    """Mid-feed crash/restart on the multi-file path: stop the query
    after a few committed micro-batches, restart from the SAME
    checkpoint, and the final sink must equal the batch result exactly
    — no lost files, no duplicated batches. The sink is the
    replay-safe idempotent writer (per-batch dynamic partition
    overwrite), so even a batch re-executed across the restart
    boundary replaces rather than appends."""
    import time

    from pyspark.sql import functions as F

    from big_data_exercise_spark.tables import load_table

    monkeypatch.setenv("SPARK_GRAFT_STREAM_FEED_FILES", str(N_FEED))
    try:
        def src():
            return (
                streams.stream_events(spark, SF_DIR)
                .filter(F.col("value") > 150)
                .select("event_id", "user_id", "event_type", "value")
            )

        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        writer = streams.idempotent_batch_writer(out)

        # phase 1: consume a strict prefix of the feed, then stop
        # 1 s trigger paces phase 1 (~1 batch/s), so the stop below
        # reliably lands mid-feed even on a loaded host
        q = (
            src().writeStream.foreachBatch(writer)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.monotonic() + 120
        while len(q.recentProgress) < 4 and time.monotonic() < deadline:
            time.sleep(0.2)
        q.stop()
        q.awaitTermination()
        n_before = len(q.recentProgress)
        assert 0 < n_before < N_FEED, (
            f"phase 1 consumed {n_before} batches — need a strict prefix"
        )

        # phase 2: restart from the committed offsets, drain the rest
        q2 = (
            src().writeStream.foreachBatch(writer)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()

        got = _rows(spark.read.parquet(out).drop("_batch_id"))
        want = _rows(
            load_table(spark, SF_DIR, "events")
            .filter(F.col("value") > 150)
            .select("event_id", "user_id", "event_type", "value")
        )
        assert got == want
    finally:
        monkeypatch.delenv("SPARK_GRAFT_STREAM_FEED_FILES", raising=False)
