"""Python DataSource API (Spark 4, public `pyspark.sql.datasource`) reader
for record-delimited flat files — the modern plug-in counterpart of
``sources/flatfile.read_delimited_records`` (which goes through the Hadoop
TextInputFormat conf).

Reference parity: the reference streams UniprotKB-style flat files through
the driver (Target.scala:453-472, toLocalIterator); both of this repo's
readers distribute the scan instead. This one registers as a first-class
``spark.read.format("flat_record")`` source so a user can read the format
without touching SparkContext/Hadoop confs.

Scale shape: one input partition per ``split_bytes`` byte range per file,
with the standard split-alignment rule of text input formats: a record is
owned by the range containing its FIRST byte; a task whose range does not
start at 0 skips forward to the first delimiter ending at-or-after its
start (that partial record belongs to the previous range) and the last
record of a range may be completed by reading past the range end. Every
record is emitted exactly once and a multi-GB file parallelizes without a
driver-side pass. Records are yielded WITHOUT the trailing delimiter and
whitespace-only records are dropped — byte-for-byte the Hadoop reader's
semantics (asserted against it in tests).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StringType, StructField, StructType


@dataclass
class _Range(InputPartition):
    path: str
    start: int
    end: int  # exclusive; the scan may read past end to finish a record


class FlatRecordReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("flat_record requires a path option")
        self.delimiter = options.get("delimiter", "//\n")
        self.split_bytes = int(options.get("split_bytes", 4 * 1024 * 1024))

    def partitions(self):
        parts: list[_Range] = []
        paths = sorted(glob.glob(self.path)) or [self.path]
        for p in paths:
            size = os.path.getsize(p)
            start = 0
            while start < size:
                parts.append(_Range(p, start, min(start + self.split_bytes, size)))
                start += self.split_bytes
        return parts or [_Range(self.path, 0, 0)]

    def read(self, partition: _Range):
        delim = self.delimiter.encode("utf-8")
        ld = len(delim)
        with open(partition.path, "rb") as fh:
            # a delimiter ENDING exactly at `start` makes `start` a record
            # boundary owned by this range — so the search window must begin
            # ld bytes before the range
            seek = max(partition.start - ld, 0)
            fh.seek(seek)
            buf = fh.read(max(partition.end - seek, 0))

            def refill() -> bool:
                nonlocal buf
                more = fh.read(self.split_bytes)
                if not more:
                    return False
                buf += more
                return True

            if partition.start == 0:
                cur = 0  # buf index of the first owned record
            else:
                rel = buf.find(delim)
                while rel < 0:
                    if not refill():
                        return  # no delimiter at/after start: nothing owned
                    rel = buf.find(delim)
                cur = rel + ld
                if seek + cur >= partition.end:
                    return  # first record at/after range end: owned by next range
            while seek + cur < partition.end:
                idx = buf.find(delim, cur)
                while idx < 0:
                    if not refill():  # trailing record, no final delimiter
                        rec = buf[cur:]
                        if rec.strip():
                            yield (rec.decode("utf-8", errors="replace"),)
                        return
                    idx = buf.find(delim, cur)
                rec = buf[cur:idx]  # delimiter stripped (Hadoop semantics)
                if rec.strip():
                    yield (rec.decode("utf-8", errors="replace"),)
                cur = idx + ld


class FlatRecordDataSource(DataSource):
    """``spark.read.format("flat_record").option("path", ...)`` source."""

    @classmethod
    def name(cls) -> str:
        return "flat_record"

    def schema(self):
        return StructType([StructField("record", StringType(), True)])

    def reader(self, schema):
        return FlatRecordReader(self.options)

    def writer(self, schema, overwrite: bool):
        return FlatRecordWriter(self.options, overwrite)

    def simpleStreamReader(self, schema):
        return FlatRecordStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return FlatRecordStreamWriter(self.options)


def register(spark) -> None:
    """Register the source on a session: ``spark.read.format("flat_record")``."""
    spark.dataSource.register(FlatRecordDataSource)


# ---------------------------------------------------------------------------
# Writer: the commit-protocol side of the plug-in API. Tasks write to
# temporary files and report them in commit messages; only the driver-side
# commit() publishes them (rename + _SUCCESS manifest), so a failed or
# speculative task never leaves partial output visible — the same
# two-phase contract as Spark's file sinks.
# ---------------------------------------------------------------------------


@dataclass
class _Committed(WriterCommitMessage):
    tmp_path: str
    n_records: int


class FlatRecordWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("flat_record write requires a path option")
        self.delimiter = options.get("delimiter", "//\n")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        os.makedirs(os.path.join(self.path, "_tmp"), exist_ok=True)
        tmp = os.path.join(self.path, "_tmp", f"{uuid.uuid4().hex}.txt")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(row.record)
                fh.write(self.delimiter)
                n += 1
        return _Committed(tmp, n)

    def commit(self, messages):
        import shutil

        total = 0
        for i, m in enumerate(sorted(
            (m for m in messages if m is not None), key=lambda m: m.tmp_path
        )):
            final = os.path.join(self.path, f"part-{i:05d}.txt")
            shutil.move(m.tmp_path, final)
            total += m.n_records
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(f"{total}\n")
        shutil.rmtree(os.path.join(self.path, "_tmp"), ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(os.path.join(self.path, "_tmp"), ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming reader: tail-follow a growing flat file. The offset is the byte
# position of the last COMPLETE record's end; each microbatch reads any
# newly appended complete records. readBetweenOffsets makes replay
# deterministic (exactly-once on retries).
# ---------------------------------------------------------------------------


class FlatRecordStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("flat_record stream requires a path option")
        self.delimiter = options.get("delimiter", "//\n")

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _complete_records(self, start: int, end: int | None = None):
        delim = self.delimiter.encode("utf-8")
        if not os.path.exists(self.path):
            return [], start
        with open(self.path, "rb") as fh:
            fh.seek(start)
            buf = fh.read() if end is None else fh.read(end - start)
        out, cur = [], 0
        while True:
            idx = buf.find(delim, cur)
            if idx < 0:
                break
            rec = buf[cur:idx]
            if rec.strip():
                out.append((rec.decode("utf-8", errors="replace"),))
            cur = idx + len(delim)
        return out, start + cur

    def read(self, start: dict):
        rows, pos = self._complete_records(start["pos"])
        return iter(rows), {"pos": pos}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows, _ = self._complete_records(start["pos"], end["pos"])
        return iter(rows)


class FlatRecordStreamWriter(DataSourceStreamWriter):
    """Streaming sink twin of FlatRecordWriter: per-microbatch two-phase
    commit. Tasks stage temp files; commit(batchId) publishes them as
    batch-<id>-part-N.txt. A RE-RUN of the same batch id (the failure
    replay Structured Streaming guarantees after a crash between task
    success and sink commit) OVERWRITES the batch's files rather than
    appending — idempotent publish = exactly-once output."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("flat_record stream write requires a path option")
        self.delimiter = options.get("delimiter", "//\n")

    def write(self, iterator):
        import uuid

        os.makedirs(os.path.join(self.path, "_tmp"), exist_ok=True)
        tmp = os.path.join(self.path, "_tmp", f"{uuid.uuid4().hex}.txt")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(row.record)
                fh.write(self.delimiter)
                n += 1
        return _Committed(tmp, n)

    def commit(self, messages, batchId: int) -> None:
        import glob as _glob
        import shutil

        for stale in _glob.glob(os.path.join(self.path, f"batch-{batchId:08d}-part-*.txt")):
            os.remove(stale)  # replayed batch: idempotent overwrite
        for i, m in enumerate(sorted(
            (m for m in messages if m is not None), key=lambda m: m.tmp_path
        )):
            shutil.move(
                m.tmp_path,
                os.path.join(self.path, f"batch-{batchId:08d}-part-{i:05d}.txt"),
            )

    def abort(self, messages, batchId: int) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, "_tmp"), ignore_errors=True)
