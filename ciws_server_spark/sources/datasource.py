"""PySpark Python Data Source for the remote CSV feed (S5 as a
first-class ``spark.read.format(...)`` source).

The reference's transfer manager (``transfer_manager.py:168-231``)
pulls datalogger CSVs over SFTP on a cron, landing them for the
loader. ``sftp_feeder.py`` reproduces that as an out-of-engine feeder;
this module additionally exposes the SAME feed through Spark 4's
Python Data Source API so it composes with the engine natively:

* batch — ``spark.read.format("ciws_feed").option("root", dir)``:
  the driver only LISTS the remote directory (names/sizes/mtimes);
  each file becomes one ``InputPartition`` and the byte transfer runs
  on the EXECUTORS, one connection per task. At 100 TB of landed CSV
  the fetch is therefore cluster-parallel, not a driver bottleneck —
  the thing the cron feeder fundamentally cannot do.
* filter pushdown (Spark 4.1 ``pushFilters``) — equality / prefix /
  suffix / contains predicates on ``src_file`` prune whole files at
  PLANNING time (the reference's filename-prefix predicate P11 —
  ``transfer_manager.py:118-125`` — becomes partition pruning instead
  of a post-scan filter).
* streaming — ``spark.readStream.format("ciws_feed")``: an
  offset-tracked incremental source with the reference's P12/P13
  guards (skip in-flight files whose mtime is newer than the pass
  start; re-read files whose size changed). The offset is the
  {name: size} map of files fully ingested — a restart from a
  checkpoint resumes exactly where the feed left off, replacing the
  feeder's "diff the landing dir" heuristic with Spark's own
  exactly-once offset log.

Rows are ``(src_file, line)`` — the same shape ``residential.
read_lines`` produces — so the whole distributed parse
(``parse_lines``: classify → per-file metadata aggregate → broadcast
join) runs unchanged downstream of either front door.

The transport is the pluggable pair from ``sftp_feeder``
(``LocalDirTransport`` everywhere, ``SFTPTransport`` where paramiko
exists). Transports hold live connections, so the *options* are what
crosses the driver/executor boundary and each task builds its own.
"""

from __future__ import annotations

import os
import tempfile
from typing import TYPE_CHECKING, Iterator, List, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
    StringContains,
    StringEndsWith,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from .sftp_feeder import LocalDirTransport, RemoteFile, SFTPTransport

if TYPE_CHECKING:  # pragma: no cover
    pass

#: Column the batch reader accepts pushed filters on.
_FILTERABLE = ("src_file",)


def _make_transport(options) -> object:
    """Build a transport from reader options (executor- or driver-side).

    ``transport=local`` (default) reads a mounted/local directory via
    ``root``; ``transport=sftp`` uses paramiko with host/username/
    keyfile/remote_dir/port options (raises where paramiko is absent —
    same import gate as the feeder).
    """
    kind = (options.get("transport") or "local").lower()
    if kind == "local":
        root = options.get("root") or options.get("path")
        if not root:
            raise ValueError("ciws_feed: option 'root' (or 'path') required")
        return LocalDirTransport(root)
    if kind == "sftp":
        return SFTPTransport(
            host=options.get("host"),
            username=options.get("username"),
            keyfile=options.get("keyfile"),
            remote_dir=options.get("remote_dir") or options.get("root"),
            port=int(options.get("port") or 22),
            strict_host_key=str(
                options.get("strict_host_key") or "false"
            ).lower()
            == "true",
        )
    raise ValueError(f"ciws_feed: unknown transport {kind!r}")


def _eligible(
    rf: RemoteFile, suffix: str, job_start: float | None
) -> bool:
    """Reference guards: skip dirs, wrong suffix, in-flight files
    (mtime newer than the listing pass start — P12)."""
    if rf.is_dir or not rf.name.lower().endswith(suffix):
        return False
    if job_start is not None and rf.mtime > job_start:
        return False
    return True


def _fetch_lines(
    transport,
    name: str,
    skip_bytes: int = 0,
    stop_bytes: int | None = None,
) -> List[str]:
    """Fetch one remote file and split to lines (executor-side).

    Uses the transport's atomic fetch into a task-local temp file, so
    an SFTP transport reuses the exact byte-moving code the feeder
    runs. Decoding is utf-8 with replacement — a junk byte must reach
    the parser (which quarantines the file), not kill the task.

    ``skip_bytes`` skips a previously-ingested prefix (the stream
    reader's per-file byte offset): only the appended tail is decoded,
    so a file that grows between micro-batches emits each line once.
    ``stop_bytes`` caps the read at the offset-recorded size, so a
    replay of a committed batch excludes bytes appended after it.
    """
    return _decode_lines(_fetch_bytes(transport, name, skip_bytes, stop_bytes))


def _fetch_bytes(
    transport, name: str, skip_bytes: int = 0, stop_bytes: int | None = None
) -> bytes:
    """Fetch one remote file's byte range via the transport's atomic
    temp-file fetch (the exact byte-moving code the feeder runs)."""
    fd, tmp = tempfile.mkstemp(prefix="ciws_feed_")
    os.close(fd)
    try:
        transport.fetch(name, tmp)
        with open(tmp, "rb") as fh:
            if skip_bytes:
                fh.seek(skip_bytes)
            return fh.read() if stop_bytes is None else fh.read(
                max(stop_bytes - skip_bytes, 0)
            )
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def _decode_lines(data: bytes) -> List[str]:
    return data.decode("utf-8", errors="replace").splitlines()


class _FilePartition(InputPartition):
    """One remote file = one input partition (parallel executor fetch)."""

    def __init__(self, name: str, size: int):
        self.name = name
        self.size = size


class CiwsFeedBatchReader(DataSourceReader):
    """Backfill reader: list driver-side, fetch executor-side."""

    def __init__(self, schema: StructType, options):
        self.options = dict(options)
        self.suffix = (self.options.get("suffix") or ".csv").lower()
        # Planning time is the P12 in-flight cutoff for this scan.
        import time as _time

        self.job_start = _time.time()
        self._name_filters: list[Filter] = []

    # -- planning-time filter pushdown ------------------------------
    def pushFilters(self, filters: List[Filter]):
        """Accept src_file name predicates; everything else stays with
        Spark. Accepted filters prune whole files before any fetch."""
        for f in filters:
            if (
                isinstance(
                    f, (EqualTo, StringStartsWith, StringEndsWith, StringContains)
                )
                and tuple(f.attribute) == _FILTERABLE
                and isinstance(f.value, str)
            ):
                self._name_filters.append(f)
            else:
                yield f

    def _name_ok(self, name: str) -> bool:
        for f in self._name_filters:
            if isinstance(f, EqualTo) and name != f.value:
                return False
            if isinstance(f, StringStartsWith) and not name.startswith(f.value):
                return False
            if isinstance(f, StringEndsWith) and not name.endswith(f.value):
                return False
            if isinstance(f, StringContains) and f.value not in name:
                return False
        return True

    def partitions(self):
        transport = _make_transport(self.options)
        parts = [
            _FilePartition(rf.name, rf.size)
            for rf in transport.listdir()
            if _eligible(rf, self.suffix, self.job_start)
            and self._name_ok(rf.name)
        ]
        # Zero matching files must still be a valid (empty) scan.
        return parts or [_FilePartition("", 0)]

    def read(self, partition: _FilePartition) -> Iterator[Tuple]:
        if not partition.name:
            return
        transport = _make_transport(self.options)
        try:
            for line in _fetch_lines(transport, partition.name):
                yield (partition.name, line)
        finally:
            close = getattr(transport, "close", None)
            if close:
                close()


def _unpack_state(v) -> Tuple[int, int]:
    """Offset-map value → (committed_bytes, observed_size).

    Legacy checkpoints (and the common fully-committed case) store a
    bare int meaning committed == observed; a pending unterminated
    tail stores ``[committed, observed]`` (JSON round-trips lists)."""
    if isinstance(v, (list, tuple)):
        return int(v[0]), int(v[1])
    return int(v), int(v)


def _pack_state(committed: int, observed: int):
    return committed if committed == observed else [committed, observed]


class CiwsFeedStreamReader(SimpleDataSourceStreamReader):
    """Incremental feed: offset = {name: bytes-committed} per file.

    Each micro-batch ingests files that are new or changed since the
    last offset (P13), skipping in-flight files (P12). A GROWN file
    emits only the appended byte range past the committed prefix,
    and the committed offset only ever advances to a ``b'\\n'``
    boundary of the fetched range — a partial trailing line (or a
    multi-byte UTF-8 char cut mid-append) is carried, unemitted, into
    the next batch rather than split across batches. The carried tail
    is flushed once the file goes QUIESCENT (listed size unchanged
    for one whole micro-batch): a complete file without a trailing
    newline still yields its last line, one batch late. The one
    unsplittable case left is a writer that pauses mid-line for a
    full batch and then resumes the same line — indistinguishable
    from a finished file without byte-level hints. A SHRUNK file
    (replaced/truncated upstream) re-ingests from byte 0 —
    at-least-once, the only sound mode once old content is gone. The
    offset map lives in Spark's checkpoint offset log, so restart
    resumes exactly; ``readBetweenOffsets`` replays a committed batch
    by re-fetching each file's committed byte range
    ``[start-committed, end-committed)``, byte-capped so content
    appended after the commit stays in its own later batch.
    """

    def __init__(self, schema: StructType, options):
        self.options = dict(options)
        self.suffix = (self.options.get("suffix") or ".csv").lower()
        self._transport = None

    def _get_transport(self):
        if self._transport is None:
            self._transport = _make_transport(self.options)
        return self._transport

    def initialOffset(self) -> dict:
        return {"seen": {}}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        import time as _time

        job_start = _time.time()
        seen = dict(start.get("seen", {}))
        transport = self._get_transport()
        todo = [
            rf
            for rf in transport.listdir()
            if _eligible(rf, self.suffix, job_start)
            and (
                rf.name not in seen
                or _unpack_state(seen[rf.name]) != (rf.size, rf.size)
            )
        ]
        rows: list[Tuple] = []
        for rf in todo:
            prev_c, prev_s = _unpack_state(seen.get(rf.name, 0))
            if 0 < prev_c < rf.size:
                # append-growth delta: fetch only bytes past the
                # committed prefix, capped at the listed size
                data = _fetch_bytes(
                    transport, rf.name, skip_bytes=prev_c,
                    stop_bytes=rf.size,
                )
                if rf.size == prev_s:
                    # quiescent: no growth since the last batch — the
                    # carried unterminated tail is the file's real
                    # last line; flush it
                    committed = rf.size
                else:
                    # still growing: commit only whole lines; carry
                    # any unterminated tail (committed stays on a
                    # newline boundary, so the next delta never
                    # starts mid-line or mid-UTF-8-char)
                    nl = data.rfind(b"\n")
                    data = data[: nl + 1]
                    committed = prev_c + nl + 1  # prev_c if nl == -1
                for line in _decode_lines(data):
                    rows.append((rf.name, line))
            else:
                # new file, or SHRUNK (replaced/truncated): ingest
                # from byte 0 in full — including an unterminated
                # last line (a complete file need not end in '\n')
                committed = rf.size
                for line in _fetch_lines(
                    transport, rf.name, stop_bytes=rf.size
                ):
                    rows.append((rf.name, line))
            seen[rf.name] = _pack_state(committed, rf.size)
        return iter(rows), {"seen": seen}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        before = start.get("seen", {})
        after = end.get("seen", {})
        transport = self._get_transport()
        for name, state in after.items():
            a_c, a_s = _unpack_state(state)
            b_c, b_s = (
                _unpack_state(before[name]) if name in before else (0, 0)
            )
            if (a_c, a_s) == (b_c, b_s):
                continue
            # mirror read()'s branch exactly: a delta batch emitted
            # [b_c, a_c); a new/shrunk ingest emitted [0, a_c). The
            # delta condition replays read's `0 < prev_c < rf.size`
            # with rf.size == a_s (the size recorded by that batch).
            skip = b_c if 0 < b_c < a_s else 0
            if a_c <= skip:
                continue  # no-newline delta: that batch emitted nothing
            for line in _fetch_lines(
                transport, name, skip_bytes=skip, stop_bytes=a_c
            ):
                yield (name, line)

    def commit(self, end: dict) -> None:
        # Nothing to clean up source-side: files are archived by the
        # downstream sink (S11), not the reader.
        pass


class CiwsFeedDataSource(DataSource):
    """``spark.read.format("ciws_feed")`` / ``readStream`` front door."""

    @classmethod
    def name(cls) -> str:
        return "ciws_feed"

    def schema(self) -> str:
        return "src_file string, line string"

    def reader(self, schema: StructType) -> CiwsFeedBatchReader:
        return CiwsFeedBatchReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> CiwsFeedStreamReader:
        return CiwsFeedStreamReader(schema, self.options)


class _StagedFile(WriterCommitMessage):
    """One task's staged output: (staging path, line count)."""

    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


def _stage_lines(options, rows) -> _StagedFile:
    """Executor side: stream this partition's lines to a staging file.

    The column written is ``line`` (the ``render_lines`` output); any
    single-string-column frame works. Staging lives under the target
    so the later rename is same-filesystem atomic.
    """
    root = options.get("path") or options.get("root")
    if not root:
        raise ValueError("ciws_line_protocol: option 'path' required")
    staging = os.path.join(root, ".staging")
    os.makedirs(staging, exist_ok=True)
    import uuid

    path = os.path.join(staging, f"part-{uuid.uuid4().hex}.lp.part")
    n = 0
    with open(path, "w", encoding="utf-8") as fh:
        for row in rows:
            fh.write(row[0])
            fh.write("\n")
            n += 1
    return _StagedFile(path, n)


def _publish(options, messages, batch_id: int) -> None:
    """Driver side: atomically publish staged files under DETERMINISTIC
    names — ``batch-<id>-part-<i>.lp`` — so a replayed micro-batch
    (restart between sink commit and offset-log commit) overwrites its
    own files instead of duplicating points: exactly-once output for
    the idempotent-replay contract Structured Streaming gives sinks.
    Requires target and staging on one shared filesystem (the same
    assumption every file sink in sinks.py makes).
    """
    root = options.get("path") or options.get("root")
    # A replay is not guaranteed the same partitioning: fewer staged
    # parts (or parts that are now empty) would leave the first
    # attempt's higher-index batch-<id>-part-*.lp files in place and
    # duplicate their points. Clear every file of THIS batch id first;
    # the replace below then republishes exactly the replayed set.
    import glob as _glob

    for stale in _glob.glob(
        os.path.join(root, f"batch-{batch_id}-part-*.lp")
    ):
        try:
            os.unlink(stale)
        except OSError:
            pass
    for i, m in enumerate(m for m in messages if m is not None):
        final = os.path.join(root, f"batch-{batch_id}-part-{i}.lp")
        if m.n == 0:
            os.unlink(m.path)
            continue
        os.replace(m.path, final)


def _discard(messages) -> None:
    for m in messages:
        if m is not None:
            try:
                os.unlink(m.path)
            except OSError:
                pass


class CiwsLineProtocolStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.options = dict(options)

    def write(self, iterator) -> _StagedFile:
        return _stage_lines(self.options, iterator)

    def commit(self, messages, batchId: int) -> None:
        _publish(self.options, messages, batchId)

    def abort(self, messages, batchId: int) -> None:
        _discard(messages)


class CiwsLineProtocolBatchWriter(DataSourceWriter):
    """One-shot export: published under batch id -1 (a stream into the
    same directory never collides — its ids are ≥0)."""

    def __init__(self, options):
        self.options = dict(options)

    def write(self, iterator) -> _StagedFile:
        return _stage_lines(self.options, iterator)

    def commit(self, messages) -> None:
        _publish(self.options, messages, -1)

    def abort(self, messages) -> None:
        _discard(messages)


class CiwsLineProtocolDataSource(DataSource):
    """``df.write`` / ``writeStream.format("ciws_line_protocol")`` —
    the engine's InfluxDB-export sink as a first-class Spark sink.

    The reference pushes derived points to its TSDB as batched line
    protocol (``transfer_manager.py:123-164``); here the rendering is
    the codegen'd ``plans/line_protocol.render_lines`` and THIS class
    owns durability: executors stage, the driver publishes renames,
    and deterministic per-batch names make micro-batch replays
    idempotent. Input contract: a single string column (``line``).
    """

    @classmethod
    def name(cls) -> str:
        return "ciws_line_protocol"

    def schema(self) -> str:
        return "line string"

    def writer(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "ciws_line_protocol is append-only (batch files are "
                "immutable once published); use mode('append')"
            )
        return CiwsLineProtocolBatchWriter(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return CiwsLineProtocolStreamWriter(self.options)


def register(spark) -> None:
    """Idempotently register the data source on a session.

    Also enables Python-data-source filter pushdown (runtime-settable;
    Spark 4.1 default is off): with the conf off, Spark REFUSES any
    filtered scan over a reader that implements ``pushFilters`` rather
    than silently skipping pushdown, so registration without the conf
    would hand out a source that throws on its headline feature.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CiwsFeedDataSource)
    spark.dataSource.register(CiwsLineProtocolDataSource)
