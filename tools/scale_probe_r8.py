"""100× scale probe for the round-8 operators (same harness as
tools/scale_probe_r7.py; results recorded in PLANS.md).

    python tools/scale_probe_r8.py            # sf0.1 base, 100×

Probed:
* fire_overlay_detections — stateless Arrow map (PNG decode → mask →
  blend → own-JPEG encode) over the event-sampled frames; zero
  shuffle, so wall should track the frame count ~linearly while the
  32 cores saturate (the overlay JPEG encode dominates).
* dedup_cluster_assignment_prod — the xxhash64 edge-feed closure. The
  replica makes every document a 100-member exact-dup clique, which
  is precisely the shape the Σk star-edge feed exists for: expect
  STRONGLY sublinear wall (the alternative Σk² clique expansion
  would be 100× worse per clique).
"""
import gc
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_exercise_spark.session import get_spark
from big_data_exercise_spark.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "100"))


def _replicate(spark, df, id_col, n1, out_sub):
    rep_dir = os.path.join(tempfile.mkdtemp(prefix="bdes_scale8_"), out_sub)
    (
        df.crossJoin(F.broadcast(
            spark.range(FACTOR).select(F.col("id").alias("__rep"))))
        .withColumn(id_col, F.col(id_col) + F.col("__rep") * (n1 + 1))
        .drop("__rep")
        .repartition(64)
        .write.parquet(rep_dir)
    )
    return spark.read.parquet(rep_dir)


def main():
    from big_data_exercise_spark.dedup import cluster, minhash
    from big_data_exercise_spark.multimodal import codecs

    spark = get_spark("scale-probe-r8", cpus=32, shuffle_partitions=32)

    def run(tag, build, frame):
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        build(frame).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:.2f}s", flush=True)
        return dt

    events = load_table(spark, SF_DIR, "events")
    n_ev = events.count()
    big_ev = _replicate(spark, events, "event_id", n_ev, "events")
    print(f"events {n_ev} -> {big_ev.count()}", flush=True)
    build = codecs.fire_overlay_detections
    build(events).write.format("noop").mode("overwrite").save()  # warm
    t1 = run("fire_overlay_detections 1x", build, events)
    t2 = run(f"fire_overlay_detections {FACTOR}x", build, big_ev)
    print(f"fire_overlay_detections: ratio {t2 / t1:.2f}x at {FACTOR}x",
          flush=True)

    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    big_docs = _replicate(spark, docs, "doc_id", n_docs, "docs")
    print(f"documents {n_docs} -> {big_docs.count()}", flush=True)

    def closure_prod(frame):
        return cluster.dedup_cluster_assignment(
            frame, minhash.near_duplicate_edges(frame)
        )

    closure_prod(docs).write.format("noop").mode("overwrite").save()  # warm
    t1 = run("dedup_cluster_assignment_prod 1x", closure_prod, docs)
    t2 = run(f"dedup_cluster_assignment_prod {FACTOR}x", closure_prod, big_docs)
    print(f"dedup_cluster_assignment_prod: ratio {t2 / t1:.2f}x at {FACTOR}x",
          flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
