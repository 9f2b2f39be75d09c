"""Kafka-shaped JSON serialize / parse (SURVEY.md §2.1 S4, §2.8 D4).

The reference's producers serialize dicts with ``json.dumps``
(producer.py:40, video_producer.py:34) and its consumers parse with
``from_json`` + explicit StructType (consumer_postgres_streaming.py:
396-400). Engine version: ``F.to_json(F.struct(*))`` builds the wire
payload inside the plan (codegen, no Python), and the inverse
``F.from_json`` restores typed columns — together they are exactly a
Kafka value column round-trip without needing a broker in the test
environment. Swap the final projection for
``df.write.format("kafka")`` in production.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T


def serialize(df: DataFrame, *cols: str, key: str | None = None) -> DataFrame:
    """(key, value) string pair per row — the Kafka producer shape."""
    out = [F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value")]
    if key is not None:
        out.insert(0, F.col(key).cast("string").alias("key"))
    return df.select(*out)


def parse(df: DataFrame, value_col: Column | str, schema: T.StructType) -> DataFrame:
    """value string → typed columns (explicit schema, flattened)."""
    return df.select(F.from_json(value_col, schema).alias("m")).select("m.*")


def roundtrip(df: DataFrame, *cols: str) -> DataFrame:
    """serialize → parse back with the projected schema; output is the
    typed columns as they survived the JSON wire format."""
    schema = T.StructType([df.schema[c] for c in cols])
    return parse(serialize(df, *cols), "value", schema)
