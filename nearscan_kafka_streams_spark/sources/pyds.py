"""Custom Python DataSource (Spark 4 DataSource API): Confluent-framed
Avro record logs as a first-class `spark.read.format(...)` source.

The reference consumes Confluent-wire Avro from Kafka
(TokenBalance.java:92-113; serde wiring util/Schemas.java:113-136).
This container has no broker and no spark-sql-kafka jar, but Spark 4's
Python DataSource API lets the SAME wire bytes flow through the SAME
engine-native read path: a directory of record-log files (each record
= 4-byte big-endian length prefix + Confluent frame: magic 0x00 +
4-byte schema id + Avro body) is exposed as

    spark.dataSource.register(ConfluentAvroDataSource)
    spark.read.format("confluentavro").schema(struct)
         .option("path", dir).option("avro_schema", json).load()

Scale shape: planning lists files; ONE InputPartition per file, so a
1000-file log drives 1000 parallel decode tasks (the Kafka-partition
analog), each streaming through its file without materializing it.
Decode uses the pure-Python Avro codec (`serde/avro.py`, written from
the Avro spec) -- the identical bytes-level path the wire tests pin.
"""

from __future__ import annotations

import os
import struct as _struct
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

RECORD_LEN = _struct.Struct(">I")


def write_framed_log(
    records: list[bytes], path: str
) -> None:
    """Write already-Confluent-framed records as one length-prefixed
    log file (the test/producer-side helper)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        for rec in records:
            fh.write(RECORD_LEN.pack(len(rec)))
            fh.write(rec)


def read_framed_log(path: str) -> Iterator[bytes]:
    with open(path, "rb") as fh:
        while True:
            head = fh.read(4)
            if not head:
                return
            (n,) = RECORD_LEN.unpack(head)
            body = fh.read(n)
            if len(body) != n:
                raise EOFError(
                    f"{path}: truncated record (wanted {n} bytes, "
                    f"got {len(body)})"
                )
            yield body


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ConfluentAvroReader(DataSourceReader):
    def __init__(self, schema, options):
        self.spark_schema = schema
        path = options.get("path")
        if not path:
            raise ValueError("confluentavro: option 'path' is required")
        self.dir = path
        self.avro_schema = options.get("avro_schema")
        if not self.avro_schema:
            raise ValueError(
                "confluentavro: option 'avro_schema' (JSON) is required"
            )

    def partitions(self):
        files = sorted(
            os.path.join(self.dir, f)
            for f in os.listdir(self.dir)
            if not f.startswith(("_", "."))
        )
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        # imports INSIDE read: this body executes on executors
        from nearscan_kafka_streams_spark.serde.avro import (
            AvroCodec,
            confluent_unframe,
        )

        codec = AvroCodec(self.avro_schema)
        names = [f.name for f in self.spark_schema.fields]
        for framed in read_framed_log(partition.path):
            _schema_id, body = confluent_unframe(framed)
            rec = codec.decode(body)
            yield tuple(rec.get(n) for n in names)


class ConfluentAvroDataSource(DataSource):
    """`format("confluentavro")` -- register with
    ``spark.dataSource.register(ConfluentAvroDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "confluentavro"

    def schema(self):
        # the value schema is topic-specific; require the caller's
        # declared StructType (same stance as the Kafka reader)
        raise NotImplementedError(
            "confluentavro requires an explicit .schema(...): the Avro "
            "value schema is topic-specific (see schemas.py)"
        )

    def reader(self, schema) -> ConfluentAvroReader:
        return ConfluentAvroReader(schema, self.options)

    def simpleStreamReader(self, schema):
        return ConfluentAvroStreamReader(schema, self.options)

    def writer(self, schema, overwrite: bool):
        return ConfluentAvroWriter(schema, self.options, overwrite)


class ConfluentAvroStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the source: files are immutable append-only
    segments (the Kafka-segment analog); the offset is a per-file
    consumed-record map, so restarts resume exactly where the last
    committed micro-batch ended (checkpoint-backed, replayable via
    readBetweenOffsets).

    The Simple stream reader path materializes batches driver-side by
    design (Spark caches them for replay) -- right for control-plane
    rates; the batch reader above is the bulk path."""

    def __init__(self, schema, options):
        self.spark_schema = schema
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("confluentavro: option 'path' is required")
        avro_schema = options.get("avro_schema")
        if not avro_schema:
            raise ValueError(
                "confluentavro: option 'avro_schema' (JSON) is required"
            )
        from nearscan_kafka_streams_spark.serde.avro import AvroCodec

        self._codec = AvroCodec(avro_schema)
        self._names = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"consumed": {}}

    def _files(self):
        if not os.path.isdir(self.dir):
            return []
        return sorted(
            f for f in os.listdir(self.dir) if not f.startswith(("_", "."))
        )

    def _decode(self, framed: bytes):
        from nearscan_kafka_streams_spark.serde.avro import confluent_unframe

        _sid, body = confluent_unframe(framed)
        rec = self._codec.decode(body)
        return tuple(rec.get(n) for n in self._names)

    def _read_range(self, consumed_start: dict, consumed_end: dict | None):
        for fname in self._files():
            skip = int(consumed_start.get(fname, 0))
            stop = (
                int(consumed_end.get(fname, 0))
                if consumed_end is not None
                else None
            )
            for i, framed in enumerate(
                read_framed_log(os.path.join(self.dir, fname))
            ):
                if i < skip:
                    continue
                if stop is not None and i >= stop:
                    break
                yield fname, self._decode(framed)

    def read(self, start: dict):
        consumed = dict(start.get("consumed", {}))
        rows = []
        for fname, row in self._read_range(consumed, None):
            rows.append(row)
            consumed[fname] = consumed.get(fname, 0) + 1
        return iter(rows), {"consumed": consumed}

    def readBetweenOffsets(self, start: dict, end: dict):
        return (
            row
            for _f, row in self._read_range(
                start.get("consumed", {}), end.get("consumed", {})
            )
        )


class _SegmentCommit(WriterCommitMessage):
    def __init__(self, tmp_name: str, n_records: int):
        self.tmp_name = tmp_name
        self.n_records = n_records


class ConfluentAvroWriter(DataSourceWriter):
    """Write leg: each task encodes its partition through the Avro
    codec into a staged segment file; the driver commit RENAMES staged
    segments into place (all-or-nothing at file granularity -- the
    2-phase write every file sink uses).  Schema id for the frame
    header comes from option `schema_id` (a real deployment fetches it
    from the Schema Registry at startup, serde/registry.py)."""

    def __init__(self, schema, options, overwrite: bool):
        self.spark_schema = schema
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("confluentavro: option 'path' is required")
        self.avro_schema = options.get("avro_schema")
        if not self.avro_schema:
            raise ValueError(
                "confluentavro: option 'avro_schema' (JSON) is required"
            )
        self.schema_id = int(options.get("schema_id", "1"))
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid as _uuid

        from nearscan_kafka_streams_spark.serde.avro import (
            AvroCodec,
            confluent_frame,
        )

        codec = AvroCodec(self.avro_schema)
        tmp_name = f"_staged-{_uuid.uuid4().hex}.bin"
        n = 0
        records = []
        for row in iterator:
            records.append(
                confluent_frame(self.schema_id, codec.encode(row.asDict()))
            )
            n += 1
        write_framed_log(records, os.path.join(self.dir, tmp_name))
        return _SegmentCommit(tmp_name, n)

    def commit(self, messages):
        import shutil as _shutil
        import uuid as _uuid

        # Committed names carry a per-commit id so mode("append") into a
        # directory with earlier commits can never collide with (and
        # silently overwrite) their part files.  Staged segments move
        # into place FIRST; overwrite deletes the superseded files only
        # AFTER every new segment is live, so a crash mid-commit leaves
        # old+new (a retry converges) instead of an emptied directory.
        commit_id = _uuid.uuid4().hex[:12]
        finals: set[str] = set()
        for i, msg in enumerate(m for m in messages if m is not None):
            fname = f"part-{commit_id}-{i:05d}.bin"
            _shutil.move(
                os.path.join(self.dir, msg.tmp_name),
                os.path.join(self.dir, fname),
            )
            finals.add(fname)
        if self.overwrite:
            for f in os.listdir(self.dir):
                if (
                    f.startswith(("_staged-", "."))
                    or f in finals
                ):
                    continue
                os.remove(os.path.join(self.dir, f))

    def abort(self, messages):
        for msg in messages:
            if msg is None:
                continue
            staged = os.path.join(self.dir, msg.tmp_name)
            if os.path.exists(staged):
                os.remove(staged)
