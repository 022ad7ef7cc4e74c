"""Ledger tests (M4): append-only log + latest-wins view semantics."""

from __future__ import annotations

import pytest

from automotive_translation_pipeline_spark.ledger import Ledger


@pytest.fixture()
def ledger(spark, tmp_path):
    led = Ledger(spark, str(tmp_path / "ledger"))
    led.append(
        [
            {
                "batch_id": "fileA_1700000000",
                "input_file": "fileA.csv",
                "job_id": "batch_aaa",
                "status": "submitted",
                "timestamp": 1700000000,
                "target_language": "Telugu",
            },
            {
                "batch_id": "fileB_1700000100",
                "input_file": "fileB.csv",
                "job_id": "batch_bbb",
                "status": "submitted",
                "timestamp": 1700000100,
                "target_language": "Hindi",
            },
        ]
    )
    return led


def test_latest_wins_after_updates(ledger):
    ledger.append(
        [
            {
                "batch_id": "fileA_1700000000",
                "job_id": "batch_aaa",
                "status": "in_progress",
                "timestamp": 1700000200,
            },
            {
                "batch_id": "fileA_1700000000",
                "job_id": "batch_aaa",
                "status": "completed",
                "timestamp": 1700000300,
                "output_file": "out.csv",
            },
        ]
    )
    cur = {r["job_id"]: r for r in ledger.current().collect()}
    assert len(cur) == 2
    assert cur["batch_aaa"]["status"] == "completed"
    assert cur["batch_bbb"]["status"] == "submitted"
    # Full history is preserved (the audit trail).
    assert ledger.events().count() == 4


def test_point_lookup_and_filter(ledger):
    assert ledger.get("batch_aaa")["status"] == "submitted"
    assert ledger.get("batch_zzz") is None
    assert ledger.list("submitted").count() == 2
    assert ledger.list().count() == 2


def test_update_status_api(ledger):
    ledger.update_status("batch_bbb", "completed", output_file="b.csv")
    row = ledger.get("batch_bbb")
    assert row["status"] == "completed"
    assert row["output_file"] == "b.csv"
    with pytest.raises(KeyError):
        ledger.update_status("nope", "failed")


def test_terminal_beats_transient_same_second(ledger):
    # Two events with the SAME timestamp: terminal status must win.
    ledger.append(
        [
            {
                "batch_id": "fileB_1700000100",
                "job_id": "batch_bbb",
                "status": "finalizing",
                "timestamp": 1700000500,
            },
            {
                "batch_id": "fileB_1700000100",
                "job_id": "batch_bbb",
                "status": "completed",
                "timestamp": 1700000500,
            },
        ]
    )
    assert ledger.get("batch_bbb")["status"] == "completed"


def test_reports(ledger):
    ledger.update_status("batch_aaa", "completed")
    counts = {r["status"]: r["n"] for r in ledger.status_counts().collect()}
    assert counts == {"completed": 1, "submitted": 1}
    langs = {r["target_language"]: r["n"] for r in ledger.language_counts().collect()}
    assert langs == {"Telugu": 1, "Hindi": 1}
    rec = ledger.recent(1).collect()
    assert rec[0]["job_id"] == "batch_aaa"  # newest update wins the top spot
    assert ledger.pending().count() == 1


def test_compaction_bounds_log_growth(ledger):
    # Drive batch_aaa to terminal through several transitions; leave
    # batch_bbb pending with history.
    for status in ("validating", "in_progress", "finalizing", "completed"):
        ledger.update_status("batch_aaa", status)
    ledger.update_status("batch_bbb", "in_progress")
    assert ledger.events().count() == 7  # 2 initial + 5 transitions

    n = ledger.compact()
    # Terminal job collapses to 1 row; pending keeps its 2-event history.
    assert n == 3
    assert ledger.events().count() == 3
    # Read semantics unchanged after compaction.
    cur = {r["job_id"]: r["status"] for r in ledger.current().collect()}
    assert cur == {"batch_aaa": "completed", "batch_bbb": "in_progress"}
    # Further appends still work on the compacted log.
    ledger.update_status("batch_bbb", "completed")
    assert ledger.get("batch_bbb")["status"] == "completed"


def test_compaction_full_snapshot(ledger):
    ledger.update_status("batch_aaa", "completed")
    n = ledger.compact(keep_history_for_pending=False)
    assert n == 2  # one row per job, history dropped
    cur = {r["job_id"]: r["status"] for r in ledger.current().collect()}
    assert cur == {"batch_aaa": "completed", "batch_bbb": "submitted"}


# ---------------------------------------------------------------------------
# merge(): the jar-gated Delta MERGE seam (ROADMAP #7). Storage picks
# the upsert strategy; the READ contract through current() must be
# identical either way.
# ---------------------------------------------------------------------------


def _delta_here(spark):
    from automotive_translation_pipeline_spark.ledger import delta_available

    return delta_available(spark)


def test_merge_parquet_fallback_upserts_through_view(spark, tmp_path):
    """Without a Delta runtime, merge() == append + latest-wins: same
    upsert read semantics as a real MERGE INTO keyed on job_id."""
    led = Ledger(spark, str(tmp_path / "lm"))
    assert led.storage == "parquet" or _delta_here(spark)
    led.merge(
        [
            {"batch_id": "b1", "job_id": "batch_m1", "status": "submitted",
             "timestamp": 100},
            {"batch_id": "b2", "job_id": "batch_m2", "status": "submitted",
             "timestamp": 100},
        ]
    )
    led.merge(
        [{"batch_id": "b1", "job_id": "batch_m1", "status": "completed",
          "timestamp": 200}]
    )
    cur = {r["job_id"]: r["status"] for r in led.current().collect()}
    assert cur == {"batch_m1": "completed", "batch_m2": "submitted"}
    # One current row per key regardless of how many merges ran.
    assert led.current().count() == 2


def test_delta_storage_requires_runtime(spark, tmp_path):
    """Forcing storage='delta' without the jar must fail loudly at
    construction, not mid-lifecycle."""
    if _delta_here(spark):
        pytest.skip("delta runtime present: the gate is open here")
    with pytest.raises(RuntimeError, match="[Dd]elta"):
        Ledger(spark, str(tmp_path / "ld"), storage="delta")


def test_merge_delta_real_merge_into(spark, tmp_path):
    """With a Delta runtime: a real MERGE INTO keyed on job_id keeps
    one row per job and current() matches the parquet fallback's view
    on the same merge sequence (the cross-storage contract)."""
    if not _delta_here(spark):
        pytest.skip("no delta runtime in this container")
    rows1 = [
        {"batch_id": "b1", "job_id": "batch_m1", "status": "submitted",
         "timestamp": 100},
        {"batch_id": "b2", "job_id": "batch_m2", "status": "submitted",
         "timestamp": 100},
    ]
    rows2 = [{"batch_id": "b1", "job_id": "batch_m1", "status": "completed",
              "timestamp": 200}]
    delta = Ledger(spark, str(tmp_path / "ldm"), storage="delta")
    pq = Ledger(spark, str(tmp_path / "lpm"), storage="parquet")
    for led in (delta, pq):
        led.merge(rows1)
        led.merge(rows2)
    d = {r["job_id"]: r["status"] for r in delta.current().collect()}
    p = {r["job_id"]: r["status"] for r in pq.current().collect()}
    assert d == p == {"batch_m1": "completed", "batch_m2": "submitted"}
    # MERGE upserts in place: the delta table itself is one row per job.
    assert delta.events().count() == 2


def test_tracker_cli_in_process(ledger, capsys):
    """The batch_tracker CLI parity module: all four subcommands over a
    live ledger (reference batch_tracker.py:66-140), driven in-process
    against the session fixture."""
    from automotive_translation_pipeline_spark import tracker

    ledger.update_status("batch_aaa", "completed", output_file="outA.csv")

    assert tracker.main([ledger.path, "list"], spark=ledger.spark) == 0
    out = capsys.readouterr().out
    assert "ALL BATCH RECORDS" in out
    assert "batch_aaa" in out and "batch_bbb" in out
    assert "Total records: 2" in out
    assert "2023-11-14" in out  # F-15 rendering of 1700000100

    assert tracker.main([ledger.path, "status", "completed"], spark=ledger.spark) == 0
    out = capsys.readouterr().out
    assert "batch_aaa" in out and "batch_bbb" not in out
    assert "Records with status 'completed': 1" in out

    assert tracker.main([ledger.path, "details", "batch_bbb"], spark=ledger.spark) == 0
    out = capsys.readouterr().out
    assert "Job ID:          batch_bbb" in out
    assert "Status:          submitted" in out
    assert "Target Language: Hindi" in out

    assert tracker.main([ledger.path, "details", "nope"], spark=ledger.spark) == 0
    assert "No batch record found" in capsys.readouterr().out

    assert tracker.main([ledger.path, "summary"], spark=ledger.spark) == 0
    out = capsys.readouterr().out
    assert "Total batches: 2" in out
    assert "completed: 1" in out and "submitted: 1" in out
    assert "Hindi: 1" in out and "Telugu: 1" in out
    assert "Recent activity" in out

    assert tracker.main([ledger.path], spark=ledger.spark) == 1  # usage
    assert "Usage:" in capsys.readouterr().out


def test_tracker_cli_subprocess(ledger):
    """The real console entry path: one subprocess, its own
    SparkSession, all four subcommands against the ledger directory on
    disk."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo');\n"
        "from automotive_translation_pipeline_spark import tracker\n"
        f"led = {ledger.path!r}\n"
        "rc = 0\n"
        "for args in (['list'], ['status', 'submitted'],\n"
        "             ['details', 'batch_aaa'], ['summary']):\n"
        "    rc |= tracker.main([led] + args)\n"
        "sys.exit(rc)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ALL BATCH RECORDS" in proc.stdout
    assert "BATCH RECORDS WITH STATUS: SUBMITTED" in proc.stdout
    assert "=== BATCH DETAILS FOR JOB ID: batch_aaa ===" in proc.stdout
    assert "=== BATCH TRACKING SUMMARY ===" in proc.stdout
