"""Hot-key stream-stream join soak (round 10, VERDICT item 1).

Round 9 measured the repo's one remaining scale ceiling: with one
user owning ~22-30 % of events, the stream-stream join's batch p95
went 1.8 s -> 14.8 s — the whole hot key hash-partitions into ONE
state partition, and Structured Streaming has no AQE skew split to
rescue it. The mitigation is the salted plan
(`pipelines.click_purchase_attribution(..., salts=k)`): deterministic
event_id % k salt on the high-rate click side, purchase rows
replicated across the k salts, state keyed on (user_id, salt).

This tool measures the claim and the safety conditions together, on
BOTH the uniform dir and its skewed twin (tools/gen_skewed.py):

* for each of {inner, left_outer} x {uniform, skew} x {salts 1, 8}:
  run the join over an N-file ts-ordered feed (same harness as
  tools/stream_soak.py) and record batch-wall p50/p95 + state rows;
* PARITY: per (how, dir), the salted final row set must equal the
  unsalted one — checked with a Spark-side order-independent digest
  (count + sum + bit-xor of xxhash64 over null-marked stringified
  rows — sum alone is cancellation-prone, round-10 advice), no
  driver collect of the (large) join output. The sink is a PARQUET
  directory, not a memory sink: on an undiluted hot-key feed the
  matched-pair volume is inherently quadratic in hot density and a
  memory sink's driver collect dies on maxResultSize (measured:
  1 GB+ at hot-frac 0.4) — the parquet sink keeps the harness valid
  at exactly the volumes the mitigation targets;
* CEILING GONE: salted-on-skew batch p95 <= 3x unsalted-on-uniform
  batch p95 (the judge's "within ~3x of uniform at the same rate");
* STATE BOUNDED: salted-on-skew state rows plateau (last-quartile
  mean <= 1.5x second-quartile mean, floor 64 rows) — the purchase
  side's k-fold replication must stay inside the watermark bound,
  not accrete.

Usage: python tools/skew_stream_soak.py [uniform_dir] [skew_dir] [n_files]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stream_soak import p95  # noqa: E402

UNIFORM = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SKEW = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bdes_skew_sf01"
N_FILES = int(sys.argv[3]) if len(sys.argv) > 3 else 24

for d in (UNIFORM, SKEW):
    if not os.path.isdir(d):
        sys.exit(f"skew_stream_soak: {d!r} is not a directory")

FAILS: list[str] = []


def run_one(spark, build, n_files: int):
    """Run a streaming plan over an n_files feed; return
    (series [(state_rows, batch_ms) per data batch], digest
    (n, hash_sum, hash_xor))."""
    from pyspark.sql import functions as F

    os.environ["SPARK_GRAFT_STREAM_FEED_FILES"] = str(n_files)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "100000")
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    name = f"skewsoak_{uuid.uuid4().hex[:12]}"
    out_dir = tempfile.mkdtemp(prefix="bdes_soak_out_")
    try:
        q = (
            build().writeStream.format("parquet")
            .queryName(name)
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="bdes_soak_"))
            .start()
        )
        try:
            q.processAllAvailable()
            series = [
                (
                    sum(so.numRowsTotal for so in (p.stateOperators or [])),
                    float(p.batchDuration),
                )
                for p in (q.recentProgress or [])
                if p.numInputRows > 0
            ]
        finally:
            q.stop()
            q.awaitTermination()
        tbl = spark.read.parquet(out_dir)
        row_str = F.concat_ws(
            "|", *[F.coalesce(F.col(c).cast("string"), F.lit("∅"))
                   for c in tbl.columns]
        )
        # Order-independent digest hardened per round-10 advice: an
        # additive crc32 sum alone is collision-prone (compensating row
        # differences can cancel), so combine a 64-bit hash with BOTH
        # sum and bit-xor — cancellation would have to defeat the two
        # aggregations simultaneously.
        h = F.xxhash64(row_str)
        n, hsum, hxor = tbl.agg(
            F.count("*"), F.sum(h), F.bit_xor(h)
        ).collect()[0]
        return series, (int(n), int(hsum or 0), int(hxor or 0))
    finally:
        os.environ.pop("SPARK_GRAFT_STREAM_FEED_FILES", None)
        spark.conf.set("spark.sql.shuffle.partitions", saved)
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)


def main() -> None:
    from big_data_exercise_spark.session import get_spark
    from big_data_exercise_spark.streaming import pipelines as streams

    spark = get_spark("skew-stream-soak")
    results: dict[tuple[str, str, int], dict] = {}

    for how in ("inner", "left_outer"):
        for dname, d in (("uniform", UNIFORM), ("skew", SKEW)):
            for salts in (1, 8):
                def build(d=d, how=how, salts=salts):
                    return streams.click_purchase_attribution(
                        streams.stream_events(spark, d),
                        streams.stream_events(spark, d),
                        watermark="10 minutes",
                        how=how,
                        salts=salts,
                    )

                series, digest = run_one(spark, build, N_FILES)
                n = len(series)
                q2 = series[n // 4: n // 2]
                q4 = series[3 * n // 4:]
                rec = {
                    "n_batches": n,
                    "batch_p50_ms": sorted(ms for _, ms in series)[n // 2],
                    "batch_p95_ms": p95([ms for _, ms in series]),
                    "state_q2_mean": round(
                        sum(s for s, _ in q2) / max(1, len(q2)), 1
                    ),
                    "state_q4_mean": round(
                        sum(s for s, _ in q4) / max(1, len(q4)), 1
                    ),
                    "rows": digest[0],
                    "hash_sum": digest[1],
                    "hash_xor": digest[2],
                }
                results[(how, dname, salts)] = rec
                print(f"{how}/{dname}/salts={salts}: {json.dumps(rec)}",
                      flush=True)

    for how in ("inner", "left_outer"):
        for dname in ("uniform", "skew"):
            a = results[(how, dname, 1)]
            b = results[(how, dname, 8)]
            if (a["rows"], a["hash_sum"], a["hash_xor"]) != (
                b["rows"], b["hash_sum"], b["hash_xor"]
            ):
                FAILS.append(f"parity:{how}/{dname}")
        base = results[(how, "uniform", 1)]["batch_p95_ms"]
        salted_skew = results[(how, "skew", 8)]["batch_p95_ms"]
        unsalted_skew = results[(how, "skew", 1)]["batch_p95_ms"]
        print(
            f"{how}: p95 uniform/unsalted {base:.0f} ms, "
            f"skew/unsalted {unsalted_skew:.0f} ms "
            f"({unsalted_skew / base:.1f}x), "
            f"skew/salted {salted_skew:.0f} ms "
            f"({salted_skew / base:.1f}x)",
            flush=True,
        )
        if salted_skew > 3.0 * base:
            FAILS.append(f"ceiling:{how}")
        rec = results[(how, "skew", 8)]
        if rec["state_q4_mean"] > max(1.5 * rec["state_q2_mean"], 64):
            FAILS.append(f"state:{how}")

    print("BAD:", ", ".join(FAILS) if FAILS else "none", flush=True)
    spark.stop()
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
