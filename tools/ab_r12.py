#!/usr/bin/env python
"""Round-12 quiet-window A/B for the three round-11 late-landing
optimizations (VERDICT item 2): pq arrow_encode, kmeans arrow_assign,
pagerank driver gate — flag OFF vs ON, interleaved best-of-N through
the noop sink with bench-identical conf and per-rep cache isolation.

    SPARK_GRAFT_CPUS=32 python tools/ab_r12.py [--reps 4]

Interleaving (A,B,A,B,...) rather than blocked runs makes a mid-window
contention burst hit both arms instead of one.
"""
from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_exercise_spark.session import get_spark
from big_data_exercise_spark.tables import ensure_parallelism, load_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("r12-ab", cpus=cpus, shuffle_partitions=cpus)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")

    from big_data_exercise_spark.operators import graph
    from big_data_exercise_spark.similarity import kmeans, pq

    def emb(sp, d):
        return ensure_parallelism(load_table(sp, d, "embeddings"))

    def tbl(sp, d, t):
        return ensure_parallelism(load_table(sp, d, t))

    cases = {
        "pq_topk": {
            "off": lambda sp, d: pq.pq_topk(emb(sp, d), arrow_encode=False),
            "on": lambda sp, d: pq.pq_topk(emb(sp, d), arrow_encode=True),
        },
        "pq_topk_prod": {
            # prod has no relational twin at kcent=256 worth timing OFF
            # at full fan-out? It does — same code path, just slow;
            # keep it so the claim "arrow is the right prod default"
            # is measured, not assumed.
            "off": lambda sp, d: pq.pq_topk(
                emb(sp, d), m=pq.M_SUBS_PROD, kcent=pq.K_CENTS_PROD,
                iters=pq.ITERS_PROD, rerank=pq.RERANK_PROD,
                train_cap=pq.TRAIN_CAP_PROD, arrow_encode=False,
            ),
            "on": lambda sp, d: pq.pq_topk_prod(emb(sp, d)),
        },
        "kmeans_clusters": {
            "off": lambda sp, d: kmeans.kmeans_assignments(
                emb(sp, d), arrow_assign=False),
            "on": lambda sp, d: kmeans.kmeans_assignments(
                emb(sp, d), arrow_assign=True),
        },
        "pagerank_trade": {
            "off": lambda sp, d: graph.pagerank(
                graph.trade_edges(tbl(sp, d, "orders"), tbl(sp, d, "lineitem")),
                driver_gate=0,
            ),
            "on": lambda sp, d: graph.pagerank(
                graph.trade_edges(tbl(sp, d, "orders"), tbl(sp, d, "lineitem")),
            ),
        },
    }
    if args.only:
        cases = {k: v for k, v in cases.items() if k in args.only}

    def isolate():
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    results: dict = {}
    for name, arms in cases.items():
        walls = {"off": [], "on": []}
        # one unmeasured warm rep per arm (Python-worker spin-up)
        for arm in ("off", "on"):
            arms[arm](spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            isolate()
        for _ in range(args.reps):
            for arm in ("off", "on"):
                t0 = time.perf_counter()
                df = arms[arm](spark, args.sf_dir)
                spark.sparkContext.setJobDescription(f"r12ab:{name}:{arm}")
                df.write.format("noop").mode("overwrite").save()
                spark.sparkContext.setJobDescription(None)
                walls[arm].append(round(time.perf_counter() - t0, 3))
                isolate()
        results[name] = {
            "cpus": cpus,
            "off_best": min(walls["off"]), "on_best": min(walls["on"]),
            "off": walls["off"], "on": walls["on"],
            "speedup": round(min(walls["off"]) / max(min(walls["on"]), 1e-9), 3),
        }
        print(f"# {name}: off {walls['off']} on {walls['on']}", file=sys.stderr)
    results["load_avg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
