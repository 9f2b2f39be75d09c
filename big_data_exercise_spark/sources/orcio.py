"""ORC source/sink — the second columnar format Spark ships natively
(SURVEY.md §2.1 scan family). Everything parquet gives the engine —
column pruning, predicate pushdown into stripe/row-group indexes,
vectorized reads, partitionBy layout — holds for ORC through the same
DataFrame reader/writer API, so supporting it is a format flag, not a
new code path. Included because warehouse migrations routinely hand a
Spark pipeline ORC inputs (Hive's default layout), and the round-trip
is the cheapest proof the engine preserves types end to end (binary
format: no text-serialization caveats, unlike CSV)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str) -> None:
    """Distributed ORC sink (snappy-compressed by default)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan; schema comes from file metadata (self-describing
    format — no inference pass, unlike CSV)."""
    return spark.read.orc(path)


def roundtrip(df: DataFrame, path: str) -> DataFrame:
    """Write → read. ORC is typed and self-describing, so any Spark
    SQL type round-trips losslessly — including arrays/structs/maps
    that CSV cannot carry."""
    write_orc(df, path)
    return read_orc(df.sparkSession, path)
