"""Custom connector surface: the Spark 4 Python DataSource API.

The reference wires ad-hoc producers to its ingest path; the idiomatic
Spark extension point for a source with no JVM connector is
``pyspark.sql.datasource.DataSource`` — schema declaration, partition
planning, and a per-partition iterator that executes ON THE EXECUTORS
(Arrow-batched back into the JVM). This module implements a
deterministic synthetic-events source with it:

* ``partitions()`` splits the keyspace into disjoint id ranges — the
  contract that makes the read parallel and, at 100 TB, lets a real
  connector map partitions to remote shards/files/offsets;
* ``read(partition)`` yields plain tuples; values are pure integer
  arithmetic on the row id, so the content is reproducible from the
  (rows, partitions) options alone — which is what lets a SQL oracle
  replay it exactly.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)``.

    Columns: id (0..N), bucket = id mod 10, score = (id·7 mod 1000)/10
    — small exact doubles, so cross-engine sums can't drift.
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id BIGINT, bucket INT, score DOUBLE"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(
            rows=int(self.options.get("rows", 1000)),
            num_partitions=int(self.options.get("partitions", 8)),
        )

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(
            rows=int(self.options.get("rows", 1000)),
            batch_rows=int(self.options.get("batchRows", 300)),
        )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, rows: int, num_partitions: int):
        self.rows = rows
        self.num_partitions = max(1, num_partitions)

    def partitions(self):
        step = -(-self.rows // self.num_partitions)  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, i % 10, (i * 7 % 1000) / 10.0)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticEventsDataSource)


def synthetic_events(spark, rows: int = 10000, partitions: int = 8):
    register(spark)
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("partitions", partitions)
        .load()
    )


class SyntheticEventsStreamReader:
    """SimpleDataSourceStreamReader: offset-managed micro-batch reads
    from the same deterministic keyspace. Offsets are plain row
    indices; each poll serves at most ``batch_rows`` rows, and a poll
    at the end returns no progress — which is what lets
    ``availableNow``/processAllAvailable terminate on a bounded
    source. A real connector would map offsets to log positions."""

    def __init__(self, rows: int, batch_rows: int):
        self.rows = rows
        self.batch_rows = batch_rows

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.batch_rows, self.rows)
        it = iter(
            [(i, i % 10, (i * 7 % 1000) / 10.0) for i in range(pos, end)]
        )
        return (it, {"pos": end})

    def readBetweenOffsets(self, start, end):
        return iter(
            [
                (i, i % 10, (i * 7 % 1000) / 10.0)
                for i in range(start["pos"], end["pos"])
            ]
        )

    def commit(self, end):
        pass


def synthetic_events_stream(spark, rows: int = 1000, batch_rows: int = 300):
    register(spark)
    return (
        spark.readStream.format("synthetic_events")
        .option("rows", rows)
        .option("batchRows", batch_rows)
        .load()
    )
