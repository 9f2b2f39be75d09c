"""Array<struct>-returning detection UDF + explode (SURVEY.md §2.11 U3).

The reference's vehicle pipeline: a pandas UDF returns one
array<struct<vehicle_type,confidence,count>> per frame, exploded into
one row per detected class (vehicle_consumer.py:119-183). The model
is mocked deterministically there too (vehicle_consumer.py:69-116) —
same policy here: the detector derives detections from the frame seed
so the full UDF → explode → relational-aggregate path is exercised
and oracle-checkable without model weights.

Fake detector (seed = frame_number):
    k = seed % 3 + 1 detections;
    detection i: type  = TYPES[(seed + i) % 4]
                 conf  = 0.5 + ((seed*7 + i*13) % 50) / 100.0
                 count = (seed + i) % 5 + 1
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from big_data_exercise_spark.functions.numeric import exact_avg
from big_data_exercise_spark.multimodal.codecs import MAGIC

TYPES = ("car", "truck", "bus", "bike")

DETECTIONS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("vehicle_type", T.StringType()),
            T.StructField("confidence", T.DoubleType()),
            T.StructField("count", T.IntegerType()),
        ]
    )
)


@F.pandas_udf(DETECTIONS_TYPE)
def detect_vehicles_udf(frame: pd.Series) -> pd.Series:
    """Series[binary frame] → Series[list[detection struct]]. A real
    model would be loaded lazily once per worker here (the reference's
    singleton pattern, vehicle_consumer.py:69-86); the deterministic
    fake reads the seed out of the FAKEIMG header instead."""

    def detect(buf: bytes) -> list[tuple[str, float, int]] | None:
        b = bytes(buf)
        if not b.startswith(MAGIC):
            return None  # P6 null guard: undecodable frame
        _w, _h, seed = struct.unpack(">IIQ", b[8:24])
        k = seed % 3 + 1
        return [
            (
                TYPES[(seed + i) % 4],
                0.5 + ((seed * 7 + i * 13) % 50) / 100.0,
                int((seed + i) % 5 + 1),
            )
            for i in range(k)
        ]

    return frame.map(detect)


def vehicle_counts(frames: DataFrame) -> DataFrame:
    """Frame → detections → explode → per-class rollup: the U3 + D1 +
    A7 chain (vehicle_consumer.py:119-183) as one relational pipeline.
    The explode is narrow; the only shuffle is the 4-group aggregate.
    """
    detected = frames.withColumn("detections", detect_vehicles_udf(F.col("frame")))
    exploded = detected.select(
        "camera_id",
        "frame_number",
        F.explode("detections").alias("det"),
    )
    return (
        exploded.select("camera_id", "frame_number", "det.*")
        .groupBy("vehicle_type")
        .agg(
            F.count("*").alias("n_detections"),
            F.sum("count").cast("long").alias("total_count"),
            exact_avg(F.col("confidence"), 4).alias("avg_confidence"),
        )
    )
