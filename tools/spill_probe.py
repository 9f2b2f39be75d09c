"""Memory-pressure spill probe (round 9): run the heaviest queries
under a deliberately small heap and record completion + spill.

The 128 GiB sandbox never forces a spill, so "survives 100×" claims
rest on plan shape alone. This probe re-runs the heavy tier at sf0.1
under a 3 GiB driver heap (local mode: the driver JVM IS the
executor; 3g mirrors the reference deployment's own container
sizing) and records, per query:

* completion (OOM/failure is a bug — slow is fine);
* wall seconds;
* memoryBytesSpilled / diskBytesSpilled summed over the query's
  stages (from the UI REST API — the probe re-enables the UI which
  the engine session normally disables).

A query that completes WITH spill under pressure demonstrates the
plan degrades the way Spark is designed to (sort/agg/join operators
fall back to disk); a query that dies demonstrates a
memory-hostile plan (e.g. an ungated broadcast or a driver-side
collect) and fails the probe.

Usage:
    python tools/spill_probe.py [sf_dir] [query ...]   # default sf0.1, all HEAVY
Env:
    SPILL_PROBE_MEM  — driver heap (default 3g)
    SPILL_PROBE_CPUS — cores (default 8: a 3 GiB heap shared by 32
                       concurrent tasks is a thread-count artifact,
                       not a data-scale one; 8 mirrors ~0.4 GiB/task,
                       the typical executor-core budget at scale)
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
if not os.path.isdir(SF_DIR):
    sys.exit(f"spill_probe: first argument must be an existing sf_dir (got {SF_DIR!r})")
MEM = os.environ.get("SPILL_PROBE_MEM", "3g")
CPUS = int(os.environ.get("SPILL_PROBE_CPUS", "8"))

HEAVY = [
    "dedup_cluster_assignment",
    "dedup_cluster_assignment_prod",
    "minhash_near_duplicates",
    "minhash_near_duplicates_prod",
    "simhash_near_duplicates",
    "curated_corpus",
    "governed_corpus",
    "pq_topk",
    "embedding_lsh_near_duplicates",
    "stream_stream_join",
]


def stage_spill(ui: str) -> tuple[int, int]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return mem, disk


def main() -> None:
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = MEM
    from big_data_exercise_spark.plans.registry import all_queries
    from big_data_exercise_spark.session import get_spark

    specs = all_queries()
    spark = get_spark(
        "spill-probe", cpus=CPUS, shuffle_partitions=CPUS,
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl
    results = {}
    prev = (0, 0)
    chosen = sys.argv[2:] or HEAVY
    assert all(n in specs for n in chosen), chosen
    for name in chosen:
        t0 = time.perf_counter()
        try:
            specs[name].build(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = round(time.perf_counter() - t0, 1)
            cur = stage_spill(ui)
            results[name] = {
                "ok": True,
                "wall_s": wall,
                "mem_spill_mb": round((cur[0] - prev[0]) / 1e6, 1),
                "disk_spill_mb": round((cur[1] - prev[1]) / 1e6, 1),
            }
            prev = cur
        except Exception as exc:  # noqa: BLE001 — the probe must report, not die
            results[name] = {
                "ok": False,
                "wall_s": round(time.perf_counter() - t0, 1),
                "err": str(exc)[:300],
            }
        print(f"{name}: {json.dumps(results[name])}", flush=True)
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
    n_bad = sum(1 for r in results.values() if not r["ok"])
    print(json.dumps({
        "probe": "spill", "mem": MEM, "cpus": CPUS, "sf_dir": SF_DIR,
        "n_queries": len(results), "n_failed": n_bad,
        "total_disk_spill_mb": round(
            sum(r.get("disk_spill_mb", 0) for r in results.values()), 1),
    }), flush=True)
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
