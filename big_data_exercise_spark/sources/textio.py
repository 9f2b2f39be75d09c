"""Raw text-line source (SURVEY.md §2.1 family): the log-file ingest
path. Many pipelines start from unstructured line logs — the engine
writes events as formatted log lines (text sink), then reads them back
with ``spark.read.text`` and parses fields out with regexp_extract:
the classic scan → parse → cast lattice, fully codegen, no UDF.

Completes the format matrix: parquet / CSV / JSON / ORC / JDBC / XML /
raw text. (Avro needs the external spark-avro jar, absent here —
format("avro") is a one-line swap when it is on the classpath.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

def _line():
    # "evt=<id> user=<id> type=<word> value=<float>"; %s over %f for
    # the double because the plain string cast is shortest-repr (the
    # value round-trips losslessly), while %f would pad and round.
    # Built lazily: Column construction needs an active SparkContext.
    return F.format_string(
        "evt=%d user=%d type=%s value=%s",
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value").cast("string"),
    )


def write_log_lines(events: DataFrame, path: str) -> None:
    """Text sink: one formatted log line per event."""
    events.select(_line().alias("value")).write.mode("overwrite").text(path)


def read_log_lines(spark: SparkSession, path: str) -> DataFrame:
    """Text scan + regexp_extract parse back to typed columns."""
    lines = spark.read.text(path)
    return lines.select(
        F.regexp_extract("value", r"evt=(\d+)", 1).cast("long").alias("event_id"),
        F.regexp_extract("value", r"user=(\d+)", 1).cast("long").alias("user_id"),
        F.regexp_extract("value", r"type=(\w+)", 1).alias("event_type"),
        F.regexp_extract("value", r"value=([0-9.Ee+-]+)", 1)
        .cast("double")
        .alias("value"),
    )


def roundtrip(events: DataFrame, path: str) -> DataFrame:
    write_log_lines(events, path)
    return read_log_lines(events.sparkSession, path)
