"""JDBC append sink + scan (SURVEY.md §2.1 S5/S8).

The reference's only sink is ``DataFrameWriter.jdbc`` append into
PostgreSQL with a tuned ``batchsize``
(consumer_postgres_streaming.py:427-440, vehicle_consumer.py:210-221).
The engine exposes the identical writer; tests run it against embedded
Apache Derby (the JDBC driver Spark already ships for its Hive
metastore), so the code path — JDBC DDL, batched INSERTs, typed
round-trip — is the real one, only the URL differs in production:

    jdbc:postgresql://host/db  +  driver=org.postgresql.Driver

Scale notes: ``numPartitions`` caps concurrent connections (a 1000-
executor cluster must not open 1000 sockets to one database); the
reference's ``batchsize`` (10/100) is far too small at scale — we
default 1000.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str) -> str:
    return f"jdbc:derby:{db_dir};create=true"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    mode: str = "append",
    batchsize: int = 1000,
    num_partitions: int | None = None,
) -> None:
    """Append-mode JDBC write (the reference's sink semantics).

    ``num_partitions`` caps concurrent DB connections with a
    ``repartition`` — a shuffle BARRIER — never ``coalesce``:
    coalesce(8) has no barrier, so the entire upstream pipeline
    (aggregations included) would execute at 8-task parallelism on a
    1000-core cluster just to spare the database (round-6 review
    finding). The one extra shuffle moves only the final result rows.
    """
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )


def read_jdbc(
    spark: SparkSession, url: str, table: str, driver: str = DERBY_DRIVER
) -> DataFrame:
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .load()
    )


def roundtrip(df: DataFrame, db_dir: str, table: str) -> DataFrame:
    """overwrite-write then read back — the smallest complete exercise
    of the JDBC writer+scan pair."""
    url = derby_url(db_dir)
    write_jdbc(df, url, table, mode="overwrite")
    return read_jdbc(df.sparkSession, url, table)
