"""100× scale probe for the round-7 operators (same harness as the
round-3/4/5 tables in PLANS.md): documents replicated 100× with
distinct doc_ids into a 64-file parquet replica, cold runs,
clearCache + gc between, wall ratio vs the 1× corpus.

    python tools/scale_probe_r7.py            # sf0.1 base, 100×

Probed:
* domain_corpus_rollup — one domain-keyed hash agg (two count-
  distincts → Expand ×3) + broadcast 1-row total; expect ~linear.
* utf8_decode_accounting — pure map stage (encode + Arrow decode);
  expect ~linear in rows / flat in wall while cores are idle.
* url_parse_fields — projection-only; scan-bound.
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
from big_data_exercise_spark.functions import urls
from big_data_exercise_spark.sources import encoding

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "100"))


def main():
    spark = get_spark("scale-probe", cpus=32, shuffle_partitions=32)
    docs = load_table(spark, SF_DIR, "documents")
    n1 = docs.count()

    # distinct doc_ids per replica so %7 host assignment and dedup
    # keys vary realistically; 64-file layout so the scan
    # parallelizes (the round-5 lesson: a single-file replica caps
    # the scan at ~3 tasks and measures the file, not the operator)
    rep_dir = os.path.join(tempfile.mkdtemp(prefix="bdes_scale_"), "docs")
    (
        docs.crossJoin(F.broadcast(
            spark.range(FACTOR).select(F.col("id").alias("__rep"))))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * (n1 + 1))
        .drop("__rep")
        .repartition(64)
        .write.parquet(rep_dir)
    )
    big = spark.read.parquet(rep_dir)
    print(f"base {n1} rows -> replica {big.count()} rows", flush=True)

    def run(tag, build, frame):
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        build(frame).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:.2f}s", flush=True)
        return dt

    for name, build in (
        ("domain_corpus_rollup", urls.domain_corpus_rollup),
        ("utf8_decode_accounting", encoding.utf8_decode_accounting),
        ("url_parse_fields", urls.url_parse_fields),
    ):
        # warm the operator's Python workers / codegen on the small
        # corpus first — the ratio should compare steady-state walls,
        # not charge one arm the one-time session costs
        build(docs).write.format("noop").mode("overwrite").save()
        t_small = run(f"{name} 1x", build, docs)
        t_big = run(f"{name} {FACTOR}x", build, big)
        print(f"{name}: ratio {t_big / t_small:.2f}x at {FACTOR}x data",
              flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
