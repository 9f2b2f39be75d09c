#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock seconds across headline queries (lower is
better). Each query is fully executed through a noop sink (every
column materialized — count() would let Catalyst prune computed
columns) so the measured time covers scan → shuffle → result, not plan
construction. A failing query contributes its elapsed-at-failure time
and is reported under "errors" — one bad query can't zero the round's
perf signal.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_exercise_spark.plans.registry import all_queries
from big_data_exercise_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "top_revenue",
    "time_bucket",
    "regional_customers",
    "order_revenue_by_priority",
    "shipping_priority",
    "local_supplier_volume",
    "prior_events_within",
    "latest_event_per_user",
    "explode_words",
    "json_props_stats",
    "text_quality_stats",
    "dedup_exact",
    "minhash_near_duplicates",
    "minhash_near_duplicates_prod",  # the plan users actually run
    "simhash_near_duplicates",       # production xxhash64 mode
    "knn_cosine_topk",
    "embedding_near_duplicates",
    "embedding_lsh_near_duplicates",
    "vehicle_detections",
    "session_windows",
    "csv_roundtrip",
    "stream_tumbling_counts",
    "stream_jdbc_sink",
    "forecast_revenue",
    "large_volume_customers",
    "dedup_cluster_assignment",
    "stream_stream_join",
    "curated_corpus",
    "kmeans_clusters",
    "pagerank_trade",
    "knn_batch_topk",
    # round-3 de-globalized window plans — benched so the per-round
    # log shows them running with zero single-partition windows
    "rfm_segments",
    "abc_revenue_classes",
    "session_peak_concurrency",
    # round-3 additions: new first-class surfaces
    "bucketed_order_revenue",
    "pq_topk",
    "pq_topk_prod",   # round-6: production PQ64 (recall@10 = 0.994)
    "bpe_merge_rules",
    "stream_stream_left_outer",
    "heavy_hitter_users",
    "pit_feature_backfill",
    "incremental_join_refresh",
    "seasonal_decompose_daily",
    # round-4: real baseline-JPEG codec (encode→decode→resize→
    # re-encode→decode inside the Arrow UDF)
    "jpeg_pixel_stats",
    # round-5: progressive (SOF2) ingest path — successive
    # approximation + spectral selection + EOB-run decode
    "jpeg_progressive_pixel_stats",
    # round-4: low-cardinality-key ranks through the grouped
    # distributed rank (range-partitioned, no 5-task funnel)
    "top_k_per_group",
    "value_ranks",
    "ntile_histogram",
    # round-4: Morton/Z-order clustered layout (one-time 64-file
    # rewrite + 2-D box scan; the write dominates the cold number)
    "zorder_box_stats",
    # round-4: the reference pipelines' distinctive outputs — per-aspect
    # sentiment labels (absa_results shape) and per-frame segmentation
    # mask stats through the real PNG codec (fire_detections shape)
    "absa_aspect_sentiments",
    "fire_mask_stats",
    # round-5: the fire pipeline STREAMING like the reference runs it
    # (real PNG decode inside the micro-batch, append mode)
    "stream_fire_mask_stats",
]


def _pctl(sorted_vals: list[float], q: float) -> float:
    """Nearest-rank percentile over an ascending list: index
    ceil(q·n) − 1. The ad-hoc forms this replaces (``n // 2``,
    ``int(n * 0.95)``) overshoot by one order statistic whenever q·n
    is integral — p50 of 10 values read the 6th, p95 of 20 read the
    max (round-6 review finding)."""
    import math

    n = len(sorted_vals)
    return sorted_vals[max(0, min(n - 1, math.ceil(q * n) - 1))]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Cross-round perf ratchets are only meaningful on a quiet host:
    # round 3's numbers were inflated ~1.5-2x by a noisy neighbor
    # (resting load 3-6 with zero repo processes). Sample the load
    # BEFORE starting work and flag loud runs in the output so a
    # regression can be read against host pressure, not guessed.
    load_start = [round(x, 2) for x in os.getloadavg()]
    if load_start[0] >= 1.0:
        print(
            f"# WARNING: host load {load_start} at bench start — "
            "wall-clock ratchets vs idle-host rounds are unreliable",
            file=sys.stderr,
        )
    # Disk-write probe: loadavg can't see a slow or contended disk,
    # but shuffle files, state stores, checkpoints and sink writes all
    # land on it — a round-5 quiet-CPU run measured every write-heavy
    # query 1.4-2.8× slower while the plan-bound queries stayed flat,
    # explained entirely by ~98 MB/s fdatasync throughput. Embed the
    # measured rate so cross-round ratchets can be read against it.
    def disk_probe():
        # 512 MB written + fsync'd: small bursts absorb into write-back
        # cache and read 3× too fast; and on burst-credit block storage
        # (measured on this host: 572 MB/s with credits, 97 MB/s
        # drained) a start-of-run probe is optimistic — which is why
        # the probe runs again AFTER the queries, when the bench's own
        # writes have drained the bucket to the rate the shuffle/state
        # writers actually felt.
        try:
            import tempfile

            buf = os.urandom(1 << 20)
            with tempfile.NamedTemporaryFile(dir=tempfile.gettempdir()) as f:
                t0 = time.perf_counter()
                for _ in range(512):
                    f.write(buf)
                f.flush()
                os.fsync(f.fileno())
                return round(512 / (time.perf_counter() - t0), 1)
        except Exception as exc:  # noqa: BLE001
            print(f"# disk probe failed: {exc}", file=sys.stderr)
            return None

    # Quiet-host gate: cross-round ratchets are only readable when the
    # run starts at load < 1 AND disk >= 500 MB/s (this host's storage
    # is burst-credit: 572 MB/s with credits, ~97 drained). Rather than
    # record a loud artifact and adjudicate it from side channels, WAIT
    # for a quiet window — bounded so a permanently-busy host still
    # produces a bench (the embedded probes then say it's loud).
    # SPARK_GRAFT_QUIET_WAIT_SECS=0 disables the wait.
    wait_budget = float(os.environ.get("SPARK_GRAFT_QUIET_WAIT_SECS", "900"))
    deadline = time.monotonic() + wait_budget
    disk_mbps = disk_probe()
    # Re-probe the disk ONLY when the disk gate is the one failing: the
    # probe itself writes 512 MB + fsync, and hammering it every 60 s
    # while merely waiting out a load spike would drain the very burst
    # credits the gate is waiting to see recover. A probe that errors
    # (None) will not heal by waiting — skip the gate instead of
    # burning the whole budget on it.
    while (
        disk_mbps is not None
        and (load_start[0] >= 1.0 or disk_mbps < 500)
        and time.monotonic() < deadline
    ):
        print(
            f"# waiting for quiet host: load {load_start[0]}, "
            f"disk {disk_mbps} MB/s (gate: load<1 and disk>=500, "
            f"{max(0, deadline - time.monotonic()):.0f}s left)",
            file=sys.stderr,
        )
        time.sleep(60)
        load_start = [round(x, 2) for x in os.getloadavg()]
        if disk_mbps < 500:
            disk_mbps = disk_probe()
    if disk_mbps is None:
        print("# disk probe unavailable — quiet-disk gate skipped", file=sys.stderr)
    if disk_mbps is not None and disk_mbps < 300:
        print(
            f"# WARNING: disk write {disk_mbps} MB/s at start — "
            "write-heavy queries (state stores, checkpoints, file "
            "sinks) will read slow vs fast-disk rounds",
            file=sys.stderr,
        )
    spark = get_spark("bdes-bench", cpus=cpus, shuffle_partitions=cpus)
    # Local bench files are single-digit MB; the production 128 MB split
    # size would scan each table in 1-3 tasks and serialize CPU-heavy
    # stages (decimal aggregation, tokenization). 1 MB splits restore
    # scan parallelism HERE ONLY — a real cluster keeps the default
    # (at 100 TB, 128 MB splits ≈ 800k tasks, the right granularity).
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    specs = all_queries()

    # Warm the JVM paths the queries actually use (parquet reader,
    # whole-stage codegen, noop sink) on the smallest table so the
    # first measured query doesn't absorb one-time session startup.
    from pyspark.sql import functions as F
    from big_data_exercise_spark.tables import load_table

    try:
        warm = load_table(spark, sf_dir, "region").groupBy("r_name").agg(
            F.count("*").alias("n")
        )
        warm.write.format("noop").mode("overwrite").save()
    except Exception as exc:  # noqa: BLE001 — a bad sf_dir must not kill the bench
        print(f"# warm-up failed: {exc}", file=sys.stderr)

    from big_data_exercise_spark.streaming import pipelines as _streams

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    stream_batch_ms: dict[str, dict[str, float]] = {}
    stream_batch_raw: list[float] = []
    for name in HEADLINE:
        spec = specs[name]
        _streams.LAST_BATCH_MS.clear()
        t0 = time.perf_counter()
        try:
            df = spec.build(spark, sf_dir)
            # noop sink materializes EVERY column (count() lets Catalyst
            # prune computed columns out of projection-only queries).
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
            # micro-batch latency of the stream this query just ran —
            # the metric BASELINE.md actually publishes (10-15 s
            # vehicle batches, 2-3 s fire). Data-carrying batches only.
            if _streams.LAST_BATCH_MS:
                ms = sorted(_streams.LAST_BATCH_MS)
                stream_batch_raw.extend(ms)
                stream_batch_ms[name] = {
                    "p50": round(_pctl(ms, 0.50), 1),
                    "p95": round(_pctl(ms, 0.95), 1),
                    "max": round(ms[-1], 1),
                    "n_batches": len(ms),
                }
                print(f"# {name} batch ms: {stream_batch_ms[name]}",
                      file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — keep the bench alive
            timings[name] = round(time.perf_counter() - t0, 3)
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED after {timings[name]:.3f}s: {errors[name]}",
                  file=sys.stderr)
        finally:
            # Per-query isolation: drop datasets the query cached.
            # Dead cache blocks from earlier queries otherwise squeeze
            # execution memory and the later join-heavy queries spill
            # (measured: minhash verify 5-6× slower by headline
            # position ~15 without this). clearCache covers the
            # CacheManager; the Python gc releases py4j refs to the
            # lazily-localCheckpointed frames, and the JVM gc lets the
            # ContextCleaner drop their RDD blocks before the next
            # query starts (verified: persistent-RDD count drains to 0
            # with this sequence, stays put without the JVM half).
            spark.catalog.clearCache()
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()

    # Frame-pipeline throughput over the FULL events table — directly
    # comparable to BASELINE.md's frames/min numbers (vehicle: ~600
    # frames/min/camera with a mock detector, vehicle_consumer.py:69-116;
    # ours is the same mock-detector pipeline shape: synthesize →
    # pandas_udf detect → explode → aggregate).
    frames_per_min = None
    try:
        from big_data_exercise_spark.multimodal import codecs, detections
        from big_data_exercise_spark.tables import ensure_parallelism, load_table

        # Drop every cached table the dedup/LSH queries persisted so
        # the throughput measurement isn't paying their memory pressure.
        spark.catalog.clearCache()
        ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
        n_frames = ev.count()
        # Steady-state throughput: the first pass pays Python-worker
        # startup for THIS pipeline's UDFs (measured 3-5× slower);
        # the reference's frames/min numbers are sustained rates, so
        # warm once and measure the second pass.
        pipe = detections.vehicle_counts(codecs.synthesize_frames(ev))
        pipe.write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        pipe.write.format("noop").mode("overwrite").save()
        frames_per_min = round(n_frames / (time.perf_counter() - t0) * 60)
        print(f"# frame throughput: {frames_per_min:,} frames/min", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        errors["frame_throughput"] = f"{type(exc).__name__}: {exc}"[:300]

    # Realistic-frame codec throughput (round-4 verdict item 1): the
    # registry fixtures are thumbnails, so ALSO publish the per-frame
    # constant on a camera-sized frame — single-thread decode/encode
    # fps for a noisy 640×480 RGB frame at quality 75, 4:2:0 (each
    # Spark partition runs this rate in parallel).
    jpeg_fps = {}
    try:
        import numpy as np

        from big_data_exercise_spark.multimodal.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(7)
        grad = np.sin(
            np.outer(np.linspace(0, 3, 480), np.linspace(0, 4, 640))
        ) * 60 + 120
        frame = np.clip(
            grad[..., None] + rng.normal(0, 12, (480, 640, 3)), 0, 255
        ).astype(np.uint8)
        enc = encode_jpeg(frame, quality=75, subsampling="4:2:0")
        for key, fn in (
            ("jpeg_decode_640x480_fps", lambda: decode_jpeg(enc)),
            (
                "jpeg_encode_640x480_fps",
                lambda: encode_jpeg(frame, quality=75, subsampling="4:2:0"),
            ),
        ):
            t0 = time.perf_counter()
            n = 0
            while time.perf_counter() - t0 < 1.5:
                fn()
                n += 1
            jpeg_fps[key] = round(n / (time.perf_counter() - t0), 1)
        print(f"# jpeg 640x480 fps: {jpeg_fps}", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        errors["jpeg_fps"] = f"{type(exc).__name__}: {exc}"[:300]

    # end-of-run probe: on burst-credit storage the bench's own writes
    # drain the bucket, so THIS is the rate the queries actually felt —
    # warn here too (the start probe alone is optimistic)
    disk_end = disk_probe()
    if disk_end is not None and disk_end < 300:
        print(
            f"# WARNING: disk write {disk_end} MB/s at end — the "
            "write-heavy query walls above were disk-bound",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    sf_txt = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf_txt)
    except ValueError:
        sf = None
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "frames_per_min": frames_per_min,
        **jpeg_fps,
        # host pressure context for cross-round ratchet comparisons:
        # 1/5/15-min load averages sampled at bench start AND end (a
        # shared host with a noisy neighbor inflates every wall time
        # uniformly; start-load < 1 marks a trustworthy ratchet run)
        "load_avg_start": load_start,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
        "disk_write_mbps_start": disk_mbps,
        "disk_write_mbps_end": disk_end,
    }
    if stream_batch_ms:
        out["stream_batch_ms"] = stream_batch_ms
        # flat keys for the round ledger: percentiles over ALL
        # data-carrying micro-batches across the streaming headline
        # queries (BASELINE.md's comparable rows: 10-15 s vehicle
        # batches, 2-3 s fire batches)
        pooled = sorted(stream_batch_raw)
        out["stream_batch_ms_p50"] = round(_pctl(pooled, 0.50), 1)
        out["stream_batch_ms_p95"] = round(_pctl(pooled, 0.95), 1)
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
