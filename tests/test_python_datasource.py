"""Spark 4 Python DataSource (`sources/pyds.py`): batch scan with
per-file partitions, commit/abort JSONL sink, and line-offset tailing
stream — the DataSourceV2 surface over the reference's request JSONL
format (auto_translate.py:303-332)."""

from __future__ import annotations

import json
import os
import time

import pytest

from automotive_translation_pipeline_spark.sources import register_request_jsonl


def _write_request_file(path: str, file_no: int, n: int = 3) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        for i in range(n):
            payload = {f"id-{file_no}-{i}": f"sentence {file_no} {i}"}
            fh.write(
                json.dumps(
                    {
                        "custom_id": f"batch-{file_no}{i:03d}",
                        "method": "POST",
                        "url": "/v1/chat/completions",
                        "body": {
                            "model": "gpt-4o",
                            "temperature": 0.0,
                            "max_tokens": 100,
                            "messages": [
                                {"role": "system", "content": "sys"},
                                {"role": "user", "content": json.dumps(payload)},
                            ],
                        },
                    }
                )
                + "\n"
            )


@pytest.fixture()
def registered(spark):
    register_request_jsonl(spark)
    return spark


def test_batch_read_one_partition_per_file(registered, tmp_path):
    for fi in range(3):
        _write_request_file(str(tmp_path / f"req{fi}.jsonl"), fi)
    df = registered.read.format("request_jsonl").load(str(tmp_path))
    assert df.rdd.getNumPartitions() == 3
    rows = {r.custom_id: r for r in df.collect()}
    assert len(rows) == 9
    r = rows["batch-1002"]
    assert r.model == "gpt-4o"
    assert r.temperature == 0.0
    assert r.max_tokens == 100
    assert r.payload == {"id-1-2": "sentence 1 2"}


def test_batch_read_malformed_inner_payload_is_null(registered, tmp_path):
    p = tmp_path / "bad.jsonl"
    with open(p, "w", encoding="utf-8") as fh:
        fh.write(
            json.dumps(
                {
                    "custom_id": "b-0",
                    "body": {
                        "model": "m",
                        "messages": [{"role": "user", "content": "{truncated"}],
                    },
                }
            )
            + "\n"
        )
    row = registered.read.format("request_jsonl").load(str(p)).collect()[0]
    assert row.custom_id == "b-0" and row.payload is None


def test_writer_commit_protocol_and_roundtrip(registered, tmp_path):
    src = tmp_path / "in.jsonl"
    _write_request_file(str(src), 0, n=5)
    df = registered.read.format("request_jsonl").load(str(src))
    out = str(tmp_path / "out")
    df.write.format("request_jsonl").mode("overwrite").save(out)
    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert all(n == "_SUCCESS" or n.startswith("part-") for n in names)
    assert not any(n.startswith(".staging") for n in names)
    back = registered.read.format("request_jsonl").load(out)
    # The sink serializes the read schema's rows; payload survives as a map.
    got = {r.custom_id: r.payload for r in back.collect()}
    assert got == {r.custom_id: r.payload for r in df.collect()}


def test_writer_overwrite_replaces_previous_content(registered, tmp_path):
    src = tmp_path / "in.jsonl"
    _write_request_file(str(src), 0, n=2)
    df = registered.read.format("request_jsonl").load(str(src))
    out = str(tmp_path / "out")
    df.write.format("request_jsonl").mode("overwrite").save(out)
    df.write.format("request_jsonl").mode("overwrite").save(out)
    back = registered.read.format("request_jsonl").load(out)
    assert back.count() == 2


def test_stream_tail_reads_appended_lines_exactly_once(registered, tmp_path):
    sf = str(tmp_path / "grow.jsonl")
    _write_request_file(sf, 0, n=2)
    q = (
        registered.readStream.format("request_jsonl")
        .load(sf)
        .writeStream.format("memory")
        .queryName("pyds_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            if registered.sql("SELECT * FROM pyds_tail").count() == 2:
                break
        with open(sf, "a", encoding="utf-8") as fh:
            fh.write(
                json.dumps(
                    {
                        "custom_id": "late-0",
                        "body": {
                            "model": "m",
                            "messages": [
                                {"role": "user", "content": '{"x": "y"}'}
                            ],
                        },
                    }
                )
                + "\n"
            )
        while time.time() < deadline:
            q.processAllAvailable()
            if registered.sql("SELECT * FROM pyds_tail").count() >= 3:
                break
        ids = sorted(
            r.custom_id
            for r in registered.sql("SELECT custom_id FROM pyds_tail").collect()
        )
        # exactly-once: the two seed lines appear once, plus the append
        assert ids == ["batch-0000", "batch-0001", "late-0"]
    finally:
        q.stop()
