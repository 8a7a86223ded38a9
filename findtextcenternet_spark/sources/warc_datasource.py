"""Native ``warc`` data source (Spark 4 Python DataSource API).

``spark.read.format("warc").load(dir)`` and
``spark.readStream.format("warc").load(dir)`` after
:func:`register_warc_datasource`. Same record semantics as
``sources/warc.py`` (it reuses those parsers), different I/O shape:

* ``read_warc`` goes through ``binaryFile``, which materializes each
  archive as ONE binary cell — peak memory is the whole compressed
  archive per task, and Arrow caps cells at 2 GB. This source opens the
  file on the executor and STREAMS records straight off disk through
  GzipFile, so peak memory is one record regardless of archive size —
  the shape that survives multi-GB crawl segments.
* rows leave the reader as Arrow RecordBatches (vectorized transfer),
  not per-row Python tuples.
* planning is file-per-partition (driver lists the directory once), the
  same grain as the batch reader, so 100k archives = 100k tasks that
  load-balance across any executor count.

The stream reader's offset IS the processed-file log (a sorted
full-path list in the checkpoint offset JSON): ``latestOffset`` snapshots the
landing dir, each micro-batch claims the newly-landed archives, and a
restarted query resumes from the committed set. Archive grain keeps
replays whole-file, so downstream idempotent sinks stay effectively-once.
Paths must be reachable from executors (local/NFS/DFS mount — the same
contract as every file-based source).
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from typing import Iterator

import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string, error string")

_ARROW_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("error", pa.string()),
])

_BATCH_ROWS = 512
_BATCH_BYTES = 256 << 20      # well under pa.binary()'s 2 GB offset limit


@dataclass
class WarcFilePartition(InputPartition):
    path: str
    content_types: tuple[str, ...] | None = None


def _list_archives(path: str) -> list[str]:
    """Driver-side planning: directory, glob, single file, or filesystem
    URI (s3/hdfs/… via pyarrow.fs) → sorted archive paths (sorted so
    partition ids are deterministic)."""
    from .fsutil import list_files

    return list_files(path, match=".warc")


def _iter_file_rows(path: str,
                    content_types: tuple[str, ...] | None = None
                    ) -> Iterator[tuple]:
    """Stream one archive's response records as row tuples, never holding
    more than one record in memory; a corrupt tail ends the walk with the
    standard per-archive error row. ``content_types`` mirrors the batch
    reader: non-matching HTTP payloads are dropped at the walk, before
    they reach an Arrow batch."""
    from .fsutil import open_binary
    from .warc import (SALVAGE_ERRORS, _parse_warc_date,
                       decode_http_payload, iter_warc_records,
                       split_http_response)

    with open_binary(path) as raw:
        magic = raw.read(2)
        raw.seek(0)
        fp = gzip.GzipFile(fileobj=raw) if magic == b"\x1f\x8b" \
            else io.BufferedReader(raw)
        try:
            for headers, body in iter_warc_records(fp):
                if headers.get("warc-type") != "response":
                    continue
                if "application/http" not in headers.get("content-type", ""):
                    continue
                http, raw_payload = split_http_response(body)
                if content_types is not None:
                    # filtered records skip the de-chunk/gunzip entirely
                    ct = http.get("content-type", "").lower()
                    if not any(ct.startswith(p) for p in content_types):
                        continue
                payload = decode_http_payload(http, raw_payload)
                yield (headers.get("warc-target-uri", ""),
                       _parse_warc_date(headers["warc-date"]),
                       payload, None, "", None)
        except SALVAGE_ERRORS as exc:
            yield (f"warc:tail-error:{path}", None, None, None, "",
                   f"warc: {type(exc).__name__}: {exc}")


def _read_partition(partition: WarcFilePartition | None
                    ) -> Iterator[pa.RecordBatch]:
    if partition is None:
        # an empty directory/glob yields zero partitions; PySpark then
        # substitutes [None] and still calls read(None) — return an
        # empty stream, don't crash the first query on an empty landing
        # dir (sql/worker/plan_data_source_read.py)
        return
    cols: list[list] = [[], [], [], [], [], []]
    nbytes = 0
    for row in _iter_file_rows(partition.path, partition.content_types):
        for c, v in zip(cols, row):
            c.append(v)
        nbytes += len(row[2] or b"")
        # flush on bytes as well as rows: pa.binary() offsets are 32-bit,
        # so a batch whose payloads pass 2 GB cannot be built at all
        if len(cols[0]) >= _BATCH_ROWS or nbytes >= _BATCH_BYTES:
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, t.type) for c, t in zip(cols, _ARROW_SCHEMA)],
                schema=_ARROW_SCHEMA)
            cols = [[], [], [], [], [], []]
            nbytes = 0
    if cols[0]:
        yield pa.RecordBatch.from_arrays(
            [pa.array(c, t.type) for c, t in zip(cols, _ARROW_SCHEMA)],
            schema=_ARROW_SCHEMA)


def _parse_content_types(options) -> tuple[str, ...] | None:
    """``.option("contentTypes", "text/html,application/pdf")`` — comma
    list of HTTP Content-Type prefixes to keep; absent keeps everything."""
    raw = options.get("contenttypes") or options.get("contentTypes")
    if not raw:
        return None
    return tuple(p.strip().lower() for p in raw.split(",") if p.strip())


class WarcBatchReader(DataSourceReader):
    def __init__(self, options):
        self._path = options["path"]
        self._content_types = _parse_content_types(options)

    def partitions(self):
        return [WarcFilePartition(p, self._content_types)
                for p in _list_archives(self._path)]

    def read(self, partition):
        return _read_partition(partition)


class WarcStreamReader(DataSourceStreamReader):
    """Offset = {"files": [paths committed so far]}. Tiny for any landing
    dir a single query should tail; at true crawl scale the segment list
    itself is partitioned and the batch source + an orchestrator owns the
    file log (see streaming/jobs.stream_extract_warc)."""

    def __init__(self, options):
        self._path = options["path"]
        self._content_types = _parse_content_types(options)

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        # full paths, not basenames: a glob path may span directories,
        # and the offset must identify each archive unambiguously
        return {"files": _list_archives(self._path)}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end["files"]) - set(start["files"]))
        return [WarcFilePartition(p, self._content_types) for p in new]

    def read(self, partition):
        return _read_partition(partition)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return PAGES_DDL

    def reader(self, schema):
        return WarcBatchReader(self.options)

    def streamReader(self, schema):
        return WarcStreamReader(self.options)


def register_warc_datasource(spark) -> None:
    spark.dataSource.register(WarcDataSource)
