"""CSV source/sink (SURVEY.md §2.1 S3).

The reference reads CSV with pandas at every edge (producer replay
``producer.py:44``, training ``train_absa_model.py:97``). The engine
version is a distributed scan with an **explicit schema** — the
reference's own policy for anything streamed (SURVEY.md §1.2), applied
to files too: schema inference costs an extra full pass over the data
(fatal at 100 TB) and can silently flip types between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T


def write_csv(df: DataFrame, path: str) -> None:
    """Header-ful CSV sink; one file per partition (distributed write,
    no driver collect)."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multi_line: bool = False,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Explicit-schema CSV scan. ``header=true`` consumes the header
    row; column order comes from the schema, not the file.
    ``multi_line`` stays off by default — it makes each file
    non-splittable, the wrong trade for scanning big foreign CSVs."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("multiLine", str(multi_line).lower())
        .option("mode", mode)
        .csv(path)
    )


def roundtrip(df: DataFrame, path: str) -> DataFrame:
    """Write → read with the source DataFrame's own schema. CSV is
    text: only use for types with total text round-trips (the caller
    projects to string/int/long/double columns first).

    The read back is ``multiLine`` + FAILFAST: the writer QUOTES
    embedded newlines, but a default (line-split) reader breaks such
    a record in two and PERMISSIVE mode silently nulls the halves —
    strings with newlines did not round-trip despite this docstring
    blessing strings (round-6 review finding). multiLine makes each
    file non-splittable, which is harmless exactly here: the writer
    emits one file per partition, so parallelism survives at file
    granularity; FAILFAST turns any residual mismatch into an error
    instead of corrupt rows."""
    write_csv(df, path)
    return read_csv(
        df.sparkSession, path, df.schema, multi_line=True, mode="FAILFAST"
    )
