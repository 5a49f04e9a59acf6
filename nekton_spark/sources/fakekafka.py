"""File-backed fake Kafka broker behind a Spark Python DataSource.

The image bundles neither a Kafka broker nor the spark-sql-kafka
connector jar, but the reference's ONLY integration evidence for its
Kafka path is a real-broker round-trip (``src/kafka.rs:203-215``) plus
a negative test (``:217-227``). This module is the closest executable
analog the environment allows, clearly labeled as a test double:

- :class:`FakeBroker` — Kafka's storage model: topics → numbered
  partitions → append-only offset-indexed records with binary
  key/value + timestamp. Files only, multi-process safe (Spark Python
  workers produce and consume from separate processes), records
  routed by key hash like Kafka's default partitioner.
- ``fakekafka`` DataSource — exposes the EXACT wire schema of the real
  connector (key/value binary, topic, partition, offset, timestamp,
  timestampType) and its option surface (``subscribe`` with comma
  topic lists, ``startingOffsets``, ``maxOffsetsPerTrigger``), for
  batch AND streaming reads and batch AND streaming writes.

``kafka.py``'s source/sink build their plans against this provider in
tests (``provider="fakekafka"``) and against ``format("kafka")``
verbatim in production — the projection/option plumbing under test is
the same code path either way. ``maxOffsetsPerTrigger`` is the Spark
analog of the reference's ``consume_count`` bounded-read test hook
(``src/kafka.rs:87-92``): it caps records per micro-batch rather than
per run, which is the native Structured Streaming contract.
"""

from __future__ import annotations

import os
import struct
import tempfile
import time
import zlib

from pyspark.sql import functions as F  # noqa: F401  (parity with sibling sources)

try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamWriter,
        DataSourceWriter,
        InputPartition,
        SimpleDataSourceStreamReader,
        WriterCommitMessage,
    )

    _HAS_DATASOURCE = True
except ImportError:  # Spark < 4
    _HAS_DATASOURCE = False

DEFAULT_PARTITIONS = 2


class FakeBroker:
    """Append-only topic log on disk. One file per record
    (``<root>/<topic>/<partition>/<offset:020d>``), length-prefixed
    key/value framing, created with O_EXCL so concurrent producers
    (multiple Spark workers) can never double-assign an offset."""

    def __init__(self, root: str, n_partitions: int | None = None):
        self.root = root
        os.makedirs(root, exist_ok=True)
        # the partition count is BROKER state persisted with the log:
        # readers/writers reconstruct FakeBroker(root) with no args, so
        # a constructor default would silently shrink a 4-partition
        # broker to 2 and lose partitions 2-3 from every scan. First
        # writer of the meta file wins; a conflicting explicit count is
        # refused.
        meta = os.path.join(root, ".n_partitions")

        def _read_stored() -> int:
            # the O_EXCL winner creates-then-writes: a loser arriving in
            # that window can observe an empty file — retry briefly
            for _ in range(50):
                with open(meta) as fh:
                    raw = fh.read().strip()
                if raw:
                    return int(raw)
                time.sleep(0.01)
            raise RuntimeError(f"broker meta at {meta} stayed empty")

        def _check(stored: int) -> int:
            if n_partitions is not None and n_partitions != stored:
                raise ValueError(
                    f"broker at {root} has {stored} partitions; "
                    f"cannot reopen with n_partitions={n_partitions}"
                )
            return stored

        if os.path.exists(meta):
            self.n_partitions = _check(_read_stored())
        else:
            want = n_partitions or DEFAULT_PARTITIONS
            try:
                # O_EXCL create: exactly one concurrent first-creator
                # wins; every loser re-reads the stored count and goes
                # through the same conflict check as a reopen (the old
                # tmp+os.replace was last-writer-wins, so two racing
                # creators could each proceed with their own count).
                with open(meta, "x") as fh:
                    fh.write(str(want))
                self.n_partitions = want
            except FileExistsError:
                self.n_partitions = _check(_read_stored())
        self._last_offset: dict[tuple[str, int], int] = {}

    # -- storage helpers -------------------------------------------------
    @staticmethod
    def _encode(key: bytes | None, value: bytes, ts_ms: int) -> bytes:
        klen = -1 if key is None else len(key)
        return struct.pack("<qqi", ts_ms, klen, len(value)) + (key or b"") + value

    @staticmethod
    def _decode(blob: bytes) -> tuple[bytes | None, bytes, int]:
        ts_ms, klen, vlen = struct.unpack_from("<qqi", blob)
        off = struct.calcsize("<qqi")
        key = None if klen < 0 else blob[off : off + klen]
        off += max(klen, 0)
        return key, blob[off : off + vlen], ts_ms

    def _pdir(self, topic: str, partition: int) -> str:
        return os.path.join(self.root, topic, str(partition))

    # -- producer --------------------------------------------------------
    def partition_for(self, key: bytes | None) -> int:
        """Keyed records route by key hash (Kafka's default partitioner
        shape; crc32 stands in for murmur2 — stable, not interoperable),
        keyless records to partition 0."""
        if key is None:
            return 0
        return zlib.crc32(key) % self.n_partitions

    def produce(self, topic: str, key: bytes | None, value: bytes) -> tuple[int, int]:
        part = self.partition_for(key)
        d = self._pdir(topic, part)
        os.makedirs(d, exist_ok=True)
        blob = self._encode(key, value, int(time.time() * 1000))
        # Write the full record to a hidden temp file first, then claim
        # the offset atomically with os.link — a record file is only
        # ever visible with its complete bytes, so a concurrent reader
        # polling mid-write can never see a partial frame, and a
        # producer crash leaves only an invisible ".tmp-*" orphan
        # (hidden names are excluded from next_offset's isdigit scan).
        tmp = tempfile.NamedTemporaryFile(dir=d, prefix=".tmp-", delete=False)
        try:
            tmp.write(blob)
            tmp.close()
            # per-producer offset cache: scanning the directory per
            # record made producing n records O(n²) listdir work; the
            # O_EXCL link loop below still resolves races with OTHER
            # producers (the cache is only a starting guess)
            ck = (topic, part)
            offset = self._last_offset.get(ck)
            offset = self.next_offset(topic, part) if offset is None else offset + 1
            while True:
                try:
                    os.link(tmp.name, os.path.join(d, f"{offset:020d}"))
                    break
                except FileExistsError:
                    offset += 1
            self._last_offset[ck] = offset
        finally:
            os.unlink(tmp.name)
        return part, offset

    # -- consumer --------------------------------------------------------
    def topics(self) -> list[str]:
        return sorted(
            t for t in os.listdir(self.root) if os.path.isdir(os.path.join(self.root, t))
        )

    def next_offset(self, topic: str, partition: int) -> int:
        d = self._pdir(topic, partition)
        if not os.path.isdir(d):
            return 0
        names = [n for n in os.listdir(d) if n.isdigit()]
        return max((int(n) + 1 for n in names), default=0)

    def read(
        self, topic: str, partition: int, start: int, end: int
    ) -> list[tuple[int, bytes | None, bytes, int]]:
        d = self._pdir(topic, partition)
        out = []
        for off in range(start, end):
            p = os.path.join(d, f"{off:020d}")
            try:
                with open(p, "rb") as f:
                    key, value, ts_ms = self._decode(f.read())
            except FileNotFoundError:
                break  # contiguous log: first hole is the end
            out.append((off, key, value, ts_ms))
        return out


KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def _row(topic, part, off, key, value, ts_ms):
    import datetime as dt

    return (
        key,
        value,
        topic,
        part,
        off,
        # tz-aware so the wire timestamp is the same instant regardless
        # of OS tz vs spark.sql.session.timeZone (naive local datetimes
        # shift whenever the two disagree)
        dt.datetime.fromtimestamp(ts_ms / 1000.0, tz=dt.timezone.utc),
        0,  # CREATE_TIME, like the connector reports for produced records
    )


if _HAS_DATASOURCE:

    class _TopicPartition(InputPartition):
        def __init__(self, topic, part, start, end):
            self.topic, self.part, self.start, self.end = topic, part, start, end

    class FakeKafkaBatchReader(DataSourceReader):
        """One Spark input partition per Kafka topic-partition — the
        same parallelism contract as the real connector."""

        def __init__(self, options):
            self.broker_dir = options["broker_dir"]
            self.subscribe = [t for t in options["subscribe"].split(",") if t]
            self.starting = options.get("startingoffsets", "earliest")

        def partitions(self):
            b = FakeBroker(self.broker_dir)
            parts = []
            for topic in self.subscribe:
                for p in range(b.n_partitions):
                    end = b.next_offset(topic, p)
                    start = 0 if self.starting == "earliest" else end
                    parts.append(_TopicPartition(topic, p, start, end))
            return parts

        def read(self, partition):
            b = FakeBroker(self.broker_dir)
            for off, key, value, ts_ms in b.read(
                partition.topic, partition.part, partition.start, partition.end
            ):
                yield _row(partition.topic, partition.part, off, key, value, ts_ms)

    class FakeKafkaStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.broker_dir = options["broker_dir"]
            self.subscribe = [t for t in options["subscribe"].split(",") if t]
            self.starting = options.get("startingoffsets", "earliest")
            cap = options.get("maxoffsetspertrigger")
            self.max_per_trigger = int(cap) if cap else None

        def _ends(self, b: FakeBroker):
            return {
                t: {str(p): b.next_offset(t, p) for p in range(b.n_partitions)}
                for t in self.subscribe
            }

        def initialOffset(self):
            b = FakeBroker(self.broker_dir)
            if self.starting == "latest":
                return self._ends(b)
            return {t: {str(p): 0 for p in range(b.n_partitions)} for t in self.subscribe}

        def read(self, start):
            b = FakeBroker(self.broker_dir)
            ends = self._ends(b)
            budget = self.max_per_trigger
            target: dict[str, dict[str, int]] = {}
            # deterministic (topic, partition) order; the per-trigger cap
            # is consumed in that order — the consume_count analog
            for t in self.subscribe:
                target[t] = {}
                for p in sorted(ends[t], key=int):
                    lo, hi = start[t][p], ends[t][p]
                    n = hi - lo
                    if budget is not None:
                        n = min(n, budget)
                        budget -= n
                    target[t][p] = lo + n
            return self.readBetweenOffsets(start, target), target

        def readBetweenOffsets(self, start, end):
            b = FakeBroker(self.broker_dir)
            rows = []
            for t, parts in end.items():
                for p, hi in parts.items():
                    for off, key, value, ts_ms in b.read(t, int(p), start[t][p], hi):
                        rows.append(_row(t, int(p), off, key, value, ts_ms))
            return iter(rows)

        def commit(self, end):
            pass  # log files are retained; the offset log is the ledger

    class _Committed(WriterCommitMessage):
        pass

    class FakeKafkaWriter(DataSourceWriter):
        def __init__(self, options):
            self.broker_dir = options["broker_dir"]
            self.topic = options["topic"]

        def write(self, rows):
            b = FakeBroker(self.broker_dir)

            def as_bytes(v):
                if v is None or isinstance(v, (bytes, bytearray)):
                    return None if v is None else bytes(v)
                return str(v).encode("utf-8")  # connector casts string→binary

            for row in rows:
                b.produce(self.topic, as_bytes(row.key), as_bytes(row.value) or b"")
            return _Committed()

        def commit(self, messages):
            pass

        def abort(self, messages):
            pass

    class FakeKafkaStreamWriter(FakeKafkaWriter, DataSourceStreamWriter):
        # base order matters: FakeKafkaWriter.write must precede the
        # abstract DataSourceStreamWriter.write in the MRO
        def commit(self, messages, batch_id=None):
            pass

        def abort(self, messages, batch_id=None):
            pass

    class FakeKafkaDataSource(DataSource):
        @classmethod
        def name(cls):
            return "fakekafka"

        def schema(self):
            return KAFKA_WIRE_SCHEMA

        def reader(self, schema):
            return FakeKafkaBatchReader(self.options)

        def simpleStreamReader(self, schema):
            return FakeKafkaStreamReader(self.options)

        def writer(self, schema, overwrite):
            return FakeKafkaWriter(self.options)

        def streamWriter(self, schema, overwrite):
            return FakeKafkaStreamWriter(self.options)


def register(spark):
    if not _HAS_DATASOURCE:
        raise NotImplementedError("fakekafka requires the Spark 4 Python DataSource API")
    try:
        spark.dataSource.register(FakeKafkaDataSource)
    except Exception:
        pass  # already registered
