#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock seconds across headline queries (lower is
better). Each query is fully executed (count() after a no-op cache
bypass) so the measured time covers scan → shuffle → result, not plan
construction.
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
    "prior_events_within",
    "latest_event_per_user",
    "explode_words",
    "json_props_stats",
    "text_quality_stats",
    "dedup_exact",
    "minhash_near_duplicates",
    "knn_cosine_topk",
    "embedding_near_duplicates",
    "stream_tumbling_counts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bdes-bench", cpus=cpus, shuffle_partitions=cpus)
    specs = all_queries()

    # warm the JVM/session with a trivial action so q1 doesn't pay startup
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs[name]
        t0 = time.perf_counter()
        df = spec.build(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
