"""Spark 4 Python DataSource for the batch-request JSONL format.

The reference's request file (``auto_translate.py:303-332``) is JSONL:
one OpenAI Batch API request object per line, whose user message content
is itself a serialized ``{description_id: sentence}`` JSON map. The
plain-SQL read path (`readers.read_request_jsonl`) is two passes over
that nesting: `spark.read.json` + `from_json` on the inner content.

This module exposes the same data as a first-class **DataSourceV2
source/sink** via the Python DataSource API (`pyspark.sql.datasource`,
public since Spark 4.0):

* ``spark.read.format("request_jsonl").load(path)`` — batch scan with
  ONE input partition PER FILE (the natural parallelism unit of a
  many-file request store; no sampling/inference pass like read.json),
  the inner payload map already decoded;
* ``spark.readStream.format("request_jsonl").load(path)`` — a tailing
  stream source over a growing request log with line-count offsets:
  each micro-batch reads exactly the [start, end) line range, so
  restart from the checkpoint is exactly-once;
* ``df.write.format("request_jsonl").save(path)`` — distributed JSONL
  sink with the standard commit/abort protocol (task files land under
  a hidden staging name; commit renames, abort deletes — a failed job
  never leaves half-written lines visible).

Registration is one call per session: ``register_request_jsonl(spark)``.

The decode is pure Python but runs PER PARTITION inside the executor
(Arrow-batched back to the JVM) — the driver never touches row data, so
the source holds at 100 TB: parallelism = number of files, and the
payload decode cost is the same one `from_json` would pay.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

SCHEMA = (
    "custom_id string, model string, temperature double, "
    "max_tokens int, payload map<string,string>"
)


def _data_files(path: str) -> list[str]:
    """Files of a request store: the path itself, or non-hidden files
    inside it (what `write_request_jsonl` / this sink produce)."""
    if os.path.isfile(path):
        return [path]
    return sorted(
        f
        for f in glob.glob(os.path.join(path, "*"))
        if os.path.isfile(f)
        and not os.path.basename(f).startswith((".", "_"))
    )


def _decode_line(line: str):
    """One request line → (custom_id, model, temperature, max_tokens,
    payload). Mirrors readers.read_request_jsonl: the LAST message's
    content is the id→sentence JSON map; malformed inner content → NULL
    payload (the permissive contract of R-3/R-4)."""
    obj = json.loads(line)
    body = obj.get("body") or {}
    msgs = body.get("messages") or []
    content = msgs[-1].get("content") if msgs else None
    payload = None
    if isinstance(content, str):
        try:
            parsed = json.loads(content)
            if isinstance(parsed, dict):
                payload = {str(k): str(v) for k, v in parsed.items()}
        except (ValueError, TypeError):
            payload = None
    temp = body.get("temperature")
    mt = body.get("max_tokens")
    return (
        obj.get("custom_id"),
        body.get("model"),
        float(temp) if temp is not None else None,
        int(mt) if mt is not None else None,
        payload,
    )


def _encode_line(d: dict) -> dict:
    """Row dict → one request line in the reference's v2 format
    (``auto_translate.py:310-331``): the payload map becomes the user
    message's serialized JSON content, so a write is the exact inverse
    of `_decode_line` and the sink's output is a valid request store
    for this source, `readers.read_request_jsonl`, and the upstream
    Batch API alike. Rows need `custom_id` + `payload`; model /
    temperature / max_tokens fall back to the reference's defaults."""
    if "custom_id" not in d or "payload" not in d:
        raise ValueError(
            "request_jsonl sink needs custom_id and payload columns; got "
            f"{sorted(d)}"
        )
    body = {
        "model": d.get("model") or "gpt-4o",
        "messages": [
            {"role": "system", "content": d.get("system_prompt") or ""},
            {"role": "user", "content": json.dumps(d["payload"] or {})},
        ],
        "temperature": d.get("temperature") if d.get("temperature") is not None else 0.0,
        "max_tokens": d.get("max_tokens") if d.get("max_tokens") is not None else 4000,
    }
    return {
        "custom_id": d["custom_id"],
        "method": "POST",
        "url": "/v1/chat/completions",
        "body": body,
    }


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _RequestJsonlReader(DataSourceReader):
    """Batch reader: one InputPartition per data file."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("request_jsonl requires a path (load(path))")

    def partitions(self):
        files = _data_files(self.path)
        # Zero files must still yield a valid (empty) scan: keep one
        # partition whose read() emits nothing.
        return [_FilePartition(f) for f in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    yield _decode_line(line)


class _LineRangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class _RequestJsonlStreamReader(DataSourceStreamReader):
    """Tailing stream source over ONE growing JSONL file.

    Offset = number of non-empty lines consumed so far. latestOffset
    counts the file's current lines; each micro-batch is the exact
    [start, end) slice, re-readable for recovery — the same
    deterministic-replay contract as Kafka offsets, at file-line
    granularity. (Appends must be line-atomic, which O_APPEND line
    writes are.)
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("request_jsonl stream requires a file path")

    def _count_lines(self) -> int:
        if not os.path.isfile(self.path):
            return 0
        with open(self.path, encoding="utf-8") as fh:
            return sum(1 for ln in fh if ln.strip())

    def initialOffset(self) -> dict:
        return {"line": 0}

    def latestOffset(self) -> dict:
        return {"line": self._count_lines()}

    def partitions(self, start: dict, end: dict):
        return [_LineRangePartition(self.path, start["line"], end["line"])]

    def read(self, partition: _LineRangePartition):
        if partition.end <= partition.start:
            return
        n = -1
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                n += 1
                if n < partition.start:
                    continue
                if n >= partition.end:
                    break
                yield _decode_line(line)

    def commit(self, end: dict) -> None:
        pass


@dataclass
class _TaskFile(WriterCommitMessage):
    staged: str
    final: str


class _RequestJsonlWriter(DataSourceWriter):
    """JSONL sink with commit/abort: tasks write staged files
    (``.staging-<uuid>-NNNNN``); commit() renames them to
    ``part-NNNNN.jsonl`` + ``_SUCCESS``; abort() removes the staging
    files. Readers (which skip dotted/underscored names) never observe
    a partially-failed write."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("request_jsonl sink requires a path (save(path))")
        self.run_id = uuid.uuid4().hex[:12]
        # Driver-side setup (this runs before tasks are launched).
        if overwrite and os.path.isdir(self.path):
            shutil.rmtree(self.path)
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> _TaskFile:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        staged = os.path.join(self.path, f".staging-{self.run_id}-{pid:05d}")
        final = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(_encode_line(row.asDict(recursive=True))) + "\n")
        return _TaskFile(staged=staged, final=final)

    def commit(self, messages) -> None:
        for m in messages:
            if m is not None:
                os.replace(m.staged, m.final)
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8"):
            pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class RequestJsonlDataSource(DataSource):
    """format("request_jsonl"): batch read, stream read, batch write."""

    @classmethod
    def name(cls) -> str:
        return "request_jsonl"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _RequestJsonlReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _RequestJsonlStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _RequestJsonlWriter(self.options, overwrite)


def register_request_jsonl(spark) -> None:
    """Idempotently register the source with this session."""
    spark.dataSource.register(RequestJsonlDataSource)
