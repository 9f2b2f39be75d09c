"""Z-order (Morton curve) data layout — multi-dimensional clustering
for scan pruning.

Sorting a table by ONE column makes parquet min/max (and partition)
pruning surgical on that column and useless on every other. Bit-
interleaving two key columns into a Morton z-value and range-
partition-sorting by it keeps BOTH dimensions locally clustered: each
output file covers a small rectangle of (dim1, dim2) space, so a scan
filtered on either dimension skips most files. This is the layout
trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` — here expressed
with nothing but bit arithmetic and ``repartitionByRange``, both
engine-portable.

The z-value itself is pure Column algebra (shiftleft/shiftright/AND on
BIGINTs — all codegen, no UDF), so an oracle can replay it literally.
A property test (tests/test_properties.py) verifies the layout claim
quantitatively: z-ordered range partitions cover a far smaller summed
bounding-box area than natural-order partitions over the same rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BITS = 10  # bits per dimension → 20-bit z-value


def zvalue(a: Column, b: Column, bits: int = BITS) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative
    BIGINT columns: bit i of ``a`` lands at 2i, bit i of ``b`` at
    2i+1."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def zvalue_sql(a: str, b: str, bits: int = BITS) -> str:
    """DuckDB twin of ``zvalue`` (same shifts, same bits)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_curve(events: DataFrame, top: int = 50) -> DataFrame:
    """The z-value surface over (user_id, floor(value)) — the sort key
    a ZORDER rewrite would cluster the events table by. Returns the
    curve's top corner (highest z) deterministically."""
    vbucket = F.floor(F.col("value")).cast("long")
    keyed = events.select(
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        vbucket.alias("vbucket"),
    ).select(
        "event_id",
        "user_id",
        "vbucket",
        zvalue(F.col("user_id"), F.col("vbucket")).alias("z"),
    )
    return keyed.orderBy(F.desc("z"), "event_id").limit(top)


def zorder_write(events: DataFrame, path: str, n_files: int = 16) -> None:
    """The actual layout action: range-partition by z-value and write —
    each output file covers a compact (user_id, vbucket) rectangle."""
    vbucket = F.floor(F.col("value")).cast("long")
    (
        events.withColumn("z", zvalue(F.col("user_id").cast("long"), vbucket))
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(path)
    )


def fragment_write(events: DataFrame, path: str, n_files: int = 200) -> None:
    """Simulate the small-files problem: round-robin the table into
    ``n_files`` shards (what a high-frequency streaming sink or
    over-parallel ETL leaves behind). At 100 TB the cost is real:
    NameNode/manifest pressure, per-file open overhead, and scan tasks
    far smaller than a split."""
    events.repartition(n_files).write.mode("overwrite").parquet(path)


def compact(spark, src_path: str, dst_path: str, target_files: int = 8):
    """Compaction pass: coalesce the fragmented layout down to
    ``target_files`` parquet files. ``coalesce`` (not ``repartition``)
    — file merging needs NO shuffle, each output task just concatenates
    input splits; on a cluster this runs at read-bandwidth. Returns the
    compacted DataFrame reader.

    This is the OPTIMIZE/rewrite step a long-lived table needs after
    streaming ingest (reference analog: the Postgres sink tables absorb
    per-micro-batch inserts and rely on the DB's own storage to stay
    scannable; a parquet lake must compact explicitly)."""
    spark.read.parquet(src_path).coalesce(target_files).write.mode(
        "overwrite"
    ).parquet(dst_path)
    return spark.read.parquet(dst_path)
