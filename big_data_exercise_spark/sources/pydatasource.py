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

import json
import os
import zlib
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


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


# --------------------------------------------------------------------------
# Kafka-semantics conformance source: a partitioned, offset-tracked,
# replayable file-backed log (round-4 verdict item 4).  No broker runs in
# this sandbox, so the Kafka CONTRACT the reference's consumers rely on
# (``consumer_postgres_streaming.py:219-227`` — partitioned topic,
# per-partition monotonic offsets, earliest/latest starting positions,
# maxOffsetsPerTrigger rate limiting, committed-offset restart, new
# partitions discovered mid-stream) is exercised against this stand-in:
# the same offset bookkeeping Spark's Kafka connector performs, minus the
# wire protocol.  Storage is one JSONL file per log partition on shared
# storage; offset == record index.
# --------------------------------------------------------------------------


class FileLogProducer:
    """Producer half of the stand-in: appends records to partition
    files.  Default partitioner mirrors Kafka's hash-by-key placement
    (crc32 here; Kafka uses murmur2 — any sticky deterministic hash
    gives the same per-key ordering guarantee).  ``add_partitions``
    models a topic being grown mid-stream."""

    def __init__(self, path: str, partitions: int = 2):
        self.path = path
        os.makedirs(path, exist_ok=True)
        existing = _log_partition_files(path)
        self.partitions = max(partitions, max(existing) + 1 if existing else 0)
        for p in range(self.partitions):
            open(self._file(p), "a").close()

    def _file(self, p: int) -> str:
        return os.path.join(self.path, f"p{p:05d}.jsonl")

    def add_partitions(self, n: int) -> None:
        for p in range(self.partitions, self.partitions + n):
            open(self._file(p), "a").close()
        self.partitions += n

    def send(
        self,
        key: str,
        value: str,
        ts_us: int | None = None,
        partition: int | None = None,
    ) -> int:
        """Append one record; returns the partition it landed in."""
        p = (
            partition
            if partition is not None
            else zlib.crc32(key.encode()) % self.partitions
        )
        rec = {"k": key, "v": value, "ts": 0 if ts_us is None else int(ts_us)}
        with open(self._file(p), "a", encoding="utf-8") as f:
            f.write(json.dumps(rec) + "\n")
        return p


def _log_partition_files(path: str) -> dict[int, str]:
    out = {}
    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.startswith("p") and name.endswith(".jsonl"):
                pid = int(name[1:-6])
                if pid in out:
                    # "p0.jsonl" and "p00000.jsonl" both parse to 0 —
                    # last-listdir-wins would silently drop one log.
                    raise ValueError(
                        f"duplicate log partition {pid}: "
                        f"{out[pid]!r} and {name!r}"
                    )
                out[pid] = os.path.join(path, name)
    return out


def _log_sizes(path: str) -> dict[str, int]:
    """Current end offset (record count) per partition — the 'latest'
    position a broker would report. Counts newline TERMINATORS, not
    lines: a concurrently-appending producer can leave a torn tail
    (bytes written, no ``\\n`` yet), and exposing it as an offset
    would hand ``json.loads`` a partial record in some task — Kafka's
    high-watermark rule is that a consumer never sees a record until
    it is fully committed, so the torn tail stays invisible until its
    newline lands."""
    sizes = {}
    for p, f in _log_partition_files(path).items():
        n = 0
        with open(f, "rb") as fh:
            while chunk := fh.read(1 << 20):
                n += chunk.count(b"\n")
        sizes[str(p)] = n
    return sizes


class _LogSlice(InputPartition):
    def __init__(self, file: str, pid: int, start: int, end: int):
        self.file = file
        self.pid = pid
        self.start = start
        self.end = end


def _read_slice(sl: _LogSlice):
    with open(sl.file, encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            if i >= sl.end:
                break
            if i < sl.start:
                continue
            rec = json.loads(line)
            yield (
                sl.pid,
                i,
                rec["k"],
                rec["v"],
                datetime.fromtimestamp(rec["ts"] / 1e6, tz=timezone.utc),
            )


class FileLogDataSource(DataSource):
    """``spark.readStream.format("file_log").option("path", dir)`` —
    Kafka-shaped schema (partition, offset, key, value, timestamp) and
    Kafka-shaped options: ``startingOffsets`` earliest|latest,
    ``maxOffsetsPerTrigger`` N.  Batch reads scan earliest→latest."""

    @classmethod
    def name(cls) -> str:
        return "file_log"

    def schema(self) -> str:
        return (
            "partition INT, offset BIGINT, key STRING, value STRING, "
            "timestamp TIMESTAMP"
        )

    def reader(self, schema) -> "FileLogBatchReader":
        return FileLogBatchReader(self.options["path"])

    def streamReader(self, schema) -> "FileLogStreamReader":
        mot = self.options.get("maxOffsetsPerTrigger")
        return FileLogStreamReader(
            self.options["path"],
            starting=self.options.get("startingOffsets", "earliest"),
            max_per_trigger=int(mot) if mot else None,
            group_id=self.options.get("groupId"),
        )


class FileLogBatchReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        files = _log_partition_files(self.path)
        sizes = _log_sizes(self.path)
        return [
            _LogSlice(files[p], p, 0, sizes[str(p)])
            for p in sorted(files)
            if sizes[str(p)]
        ] or [_LogSlice("", -1, 0, 0)]

    def read(self, partition: _LogSlice):
        if partition.pid < 0:
            return iter(())
        return _read_slice(partition)


class FileLogStreamReader(DataSourceStreamReader):
    """Offset bookkeeping per the Kafka connector's contract:

    * offsets are ``{partition: next_record_index}`` dicts — exactly
      the JSON shape Spark's Kafka source checkpoints;
    * ``initialOffset`` honors earliest (all zeros) / latest (current
      end — only records produced after stream start are read);
    * ``latestOffset`` clamps the batch to ``maxOffsetsPerTrigger``
      records, apportioned across partitions proportionally to lag
      (the Kafka source's rate-limit policy).  The clamp baseline is
      the last planned end; on a checkpoint restart the engine hands
      the restored start straight to ``partitions()``, so the first
      recovered batch is planned by the offset log, not by us — same
      as Kafka;
    * ``partitions(start, end)`` plans one executor slice per lagging
      log partition; a partition present in ``end`` but absent from
      ``start`` was created after the last batch (topic grown) and is
      read from 0 — Kafka's new-partition-discovery rule;
    * ``commit(end)`` mirrors Kafka's consumer-group commit: with a
      ``groupId`` option the committed position is persisted in a
      sidecar next to the log, which is what gives the rate limiter a
      SAFE clamp baseline across restarts (the engine calls
      ``latestOffset`` before revealing the restored start; clamping
      against a guessed baseline could plan end < start and re-commit
      old offsets — so without a groupId the first planning call after
      a [re]start is deliberately unclamped instead).  Restart replays
      any uncommitted batch with identical slices — the
      replayable-source half of exactly-once."""

    def __init__(
        self,
        path: str,
        starting: str,
        max_per_trigger: int | None,
        group_id: str | None = None,
    ):
        if starting not in ("earliest", "latest"):
            raise ValueError("startingOffsets must be earliest or latest")
        self.path = path
        self.starting = starting
        self.max_per_trigger = max_per_trigger
        self.group_id = group_id
        self._planned_start: dict | None = None

    def _sidecar(self) -> str:
        return os.path.join(self.path, f".offsets-{self.group_id}.json")

    def _baseline(self) -> dict | None:
        """Safe rate-limit baseline: the last planned end if this
        process saw one, else the group's committed offsets.  With a
        groupId, a missing sidecar PROVES nothing was ever committed
        (an uncommitted restored batch reaches ``partitions()`` before
        ``latestOffset`` and sets the planned end), so the fresh-start
        rule is a safe baseline; without one, an unknown baseline must
        stay unclamped."""
        if self._planned_start is not None:
            return self._planned_start
        if not self.group_id:
            return None
        if os.path.exists(self._sidecar()):
            with open(self._sidecar(), encoding="utf-8") as f:
                return json.load(f)
        if self.starting == "latest":
            return _log_sizes(self.path)
        return {}

    def initialOffset(self) -> dict:
        sizes = _log_sizes(self.path)
        off = sizes if self.starting == "latest" else {p: 0 for p in sizes}
        if self._planned_start is None:
            self._planned_start = dict(off)
        return off

    def latestOffset(self) -> dict:
        sizes = _log_sizes(self.path)
        start = self._baseline()
        lim = self.max_per_trigger
        if start is None:
            return sizes
        # lag floors at 0 and every end floors at its start: a shrunken
        # partition file (manual truncation of the JSONL log) must never
        # plan end < start — that corrupts the remainder loop and would
        # move the engine's committed offsets backwards. The floor
        # applies on the unlimited path too: with no rate limit the raw
        # sizes of a truncated file would otherwise regress the offset
        # log directly.
        if lim is None:
            return {p: max(sizes[p], start.get(p, 0)) for p in sizes}
        lag = {p: max(0, sizes[p] - start.get(p, 0)) for p in sizes}
        total = sum(lag.values())
        if total <= lim:
            return {p: max(sizes[p], start.get(p, 0)) for p in sizes}
        end = {p: start.get(p, 0) + lag[p] * lim // total for p in sizes}
        rem = lim - sum(end[p] - start.get(p, 0) for p in sizes)
        for p in sorted(sizes):  # deterministic remainder placement
            if rem <= 0:
                break
            take = min(rem, max(0, sizes[p] - end[p]))
            end[p] += take
            rem -= take
        return end

    def partitions(self, start: dict, end: dict):
        self._planned_start = dict(end)
        files = _log_partition_files(self.path)
        out = [
            _LogSlice(files[int(p)], int(p), start.get(p, 0), e)
            for p, e in sorted(end.items())
            if e > start.get(p, 0)
        ]
        return out or [_LogSlice("", -1, 0, 0)]

    def read(self, partition: _LogSlice):
        if partition.pid < 0:
            return iter(())
        return _read_slice(partition)

    def commit(self, end: dict) -> None:
        # consumer-group commit analog: persist the committed position
        # atomically so a restarted reader can clamp against it
        if self.group_id:
            tmp = self._sidecar() + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(end, f)
            os.replace(tmp, self._sidecar())


def register_file_log(spark) -> None:
    spark.dataSource.register(FileLogDataSource)


def file_log_stream(
    spark,
    path: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    group_id: str | None = None,
):
    register_file_log(spark)
    r = (
        spark.readStream.format("file_log")
        .option("path", path)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    if group_id is not None:
        r = r.option("groupId", group_id)
    return r.load()


def file_log_batch(spark, path: str):
    register_file_log(spark)
    return spark.read.format("file_log").option("path", path).load()
