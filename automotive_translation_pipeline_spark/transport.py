"""X-1..X-4: the batch-job transport — upload, submit, poll, download.

The reference drives four OpenAI Batch API calls
(``auto_translate.py:343-389``): ``files.create`` (X-1),
``batches.create`` (X-2), ``batches.retrieve`` inside the poll loop
(X-3), and ``files.content`` (X-4). The engine factors that surface
into a four-method transport protocol so the ORCHESTRATION — request
serialization, ledger transitions, the poll loop, response ingestion —
is real, tested code, and only the wire client is pluggable:

* ``LocalBatchTransport`` — a file-backed implementation that honours
  the full lifecycle contract (ids, status progression, output files)
  against a local directory, "serving" each uploaded request with the
  deterministic mock translator. This is what tests and this container
  run end-to-end.
* a real OpenAI client drops in behind the same four methods; nothing
  above the transport changes. (No network or openai package in this
  environment — see ``translate.openai_batch_submit``.)

Job ids are ``batch_<hex>`` to match the reference's F-14 scrape regex
(``Job ID: (batch_[a-zA-Z0-9]+)``, ``batch_auto_translate.py:136-140``).
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .translate import render_mock_content

# Reference status progression (BATCH_TRACKING_GUIDE.md:169-182).
_PROGRESSION = ("validating", "in_progress", "finalizing", "completed")


def _read_jsonl_input(path: str) -> list[str]:
    """Uploaded inputs may be a single file or a Spark-written directory
    of part files; normalize to a list of JSON lines."""
    p = Path(path)
    if p.is_dir():
        parts = sorted(q for q in p.iterdir() if q.name.startswith("part-"))
    else:
        parts = [p]
    lines: list[str] = []
    for part in parts:
        lines.extend(
            ln for ln in part.read_text(encoding="utf-8").splitlines() if ln
        )
    return lines


class LocalBatchTransport:
    """File-backed batch service with the OpenAI Batch API's observable
    shape: deterministic ids, per-poll status progression, response
    JSONL in the reference's nested format, optional fault injection.

    ``polls_to_complete`` controls how many ``retrieve`` calls a job
    takes to finish (the reference polls every 300 s; tests poll with
    ``interval_secs=0``). ``failing_jobs`` marks job ids that end
    ``failed`` with no output — the X-7 error path.
    """

    def __init__(
        self,
        root: str,
        polls_to_complete: int = 2,
        failing_jobs: set[str] | None = None,
    ):
        self.root = Path(root)
        (self.root / "files").mkdir(parents=True, exist_ok=True)
        self.polls_to_complete = max(1, polls_to_complete)
        self.failing_jobs = failing_jobs or set()
        self._jobs: dict[str, dict] = {}
        self._submissions = 0

    # -- X-1 ----------------------------------------------------------
    def upload_file(self, path: str) -> str:
        lines = _read_jsonl_input(path)
        blob = "\n".join(lines)
        file_id = "file_" + hashlib.md5(blob.encode()).hexdigest()[:12]
        (self.root / "files" / f"{file_id}.jsonl").write_text(
            blob, encoding="utf-8"
        )
        return file_id

    # -- X-2 ----------------------------------------------------------
    def create_batch(
        self, input_file_id: str, completion_window: str = "24h"
    ) -> dict:
        # A per-transport submission counter goes into the hashed key so
        # resubmitting identical request bytes yields a FRESH job id
        # (matching the real Batch API) instead of silently resetting
        # the prior job's state — while ids stay deterministic per
        # (transport, submission ordinal) for replayable tests.
        self._submissions += 1
        job_id = "batch_" + hashlib.md5(
            f"job|{input_file_id}|{self._submissions}".encode()
        ).hexdigest()[:12]
        self._jobs[job_id] = {
            "id": job_id,
            "input_file_id": input_file_id,
            "polls": 0,
            "status": "validating",
            "output_file_id": None,
            "completion_window": completion_window,
        }
        return {"id": job_id, "status": "validating"}

    # -- X-3 ----------------------------------------------------------
    def retrieve(self, job_id: str) -> dict:
        job = self._jobs[job_id]
        if job["status"] in ("completed", "failed"):
            return {k: job[k] for k in ("id", "status", "output_file_id")}
        job["polls"] += 1
        frac = job["polls"] / self.polls_to_complete
        stage = min(int(frac * (len(_PROGRESSION) - 1)), len(_PROGRESSION) - 2)
        if job["polls"] >= self.polls_to_complete:
            if job_id in self.failing_jobs:
                job["status"] = "failed"
            else:
                job["output_file_id"] = self._serve(job)
                job["status"] = "completed"
        else:
            job["status"] = _PROGRESSION[stage]
        return {k: job[k] for k in ("id", "status", "output_file_id")}

    def _serve(self, job: dict) -> str:
        """Answer every request line with the deterministic mock
        translator, in the reference's nested response format."""
        in_path = self.root / "files" / f"{job['input_file_id']}.jsonl"
        out_lines = []
        for line in in_path.read_text(encoding="utf-8").splitlines():
            req = json.loads(line)
            custom_id = req["custom_id"]
            payload = json.loads(req["body"]["messages"][1]["content"])
            content = render_mock_content(payload, custom_id)
            out_lines.append(
                json.dumps(
                    {
                        "custom_id": custom_id,
                        "response": {
                            "status_code": 200,
                            "body": {
                                "choices": [{"message": {"content": content}}]
                            },
                        },
                        "error": None,
                    },
                    ensure_ascii=False,
                )
            )
        out_id = "file_out_" + job["id"][len("batch_"):]
        (self.root / "files" / f"{out_id}.jsonl").write_text(
            "\n".join(out_lines), encoding="utf-8"
        )
        return out_id

    # -- X-4 ----------------------------------------------------------
    def download(self, file_id: str, dest: str) -> str:
        src = self.root / "files" / f"{file_id}.jsonl"
        Path(dest).parent.mkdir(parents=True, exist_ok=True)
        Path(dest).write_text(src.read_text(encoding="utf-8"), encoding="utf-8")
        return dest


class OpenAIBatchTransport:
    """The real wire client behind the same four-method protocol — the
    reference's actual Batch API calls (``auto_translate.py:343-389``:
    ``client.files.create`` / ``batches.create`` / ``batches.retrieve``
    / ``files.content``) so a networked deployment drops in with ZERO
    orchestration changes: ``run_batch_lifecycle`` and the poll service
    accept this class unchanged.

    Import-gated like the Kafka source factory (``streaming/flagship
    .kafka_descriptions_stream``): constructing without the ``openai``
    package or an API key raises immediately with a clear error instead
    of failing mid-lifecycle. ``client`` is injectable for tests (a
    mock with the same attribute surface).
    """

    ENDPOINT = "/v1/chat/completions"  # reference auto_translate.py:356

    def __init__(self, api_key: str | None = None, client=None):
        if client is not None:
            self.client = client
            return
        key = api_key or os.environ.get("OPENAI_API_KEY")
        if not key:
            raise RuntimeError(
                "OpenAIBatchTransport needs an API key: pass api_key= or "
                "set OPENAI_API_KEY (reference README.md setup), or use "
                "LocalBatchTransport for offline runs"
            )
        try:
            from openai import OpenAI  # noqa: PLC0415 — deliberate gate
        except ImportError as e:  # pragma: no cover - package-absent env
            raise RuntimeError(
                "OpenAIBatchTransport requires the 'openai' package "
                "(pip install openai); this container does not ship it — "
                "use LocalBatchTransport"
            ) from e
        self.client = OpenAI(api_key=key)

    # -- X-1: auto_translate.py:343-349 -------------------------------
    def upload_file(self, path: str) -> str:
        # Spark writes JSONL as a part-file directory; the Batch API
        # wants one file — normalize through the same reader as the
        # local transport, then upload the joined bytes.
        blob = "\n".join(_read_jsonl_input(path)).encode("utf-8")
        batch_file = self.client.files.create(
            file=("requests.jsonl", blob), purpose="batch"
        )
        return batch_file.id

    # -- X-2: auto_translate.py:352-359 -------------------------------
    def create_batch(
        self, input_file_id: str, completion_window: str = "24h"
    ) -> dict:
        job = self.client.batches.create(
            input_file_id=input_file_id,
            endpoint=self.ENDPOINT,
            completion_window=completion_window,
        )
        return {"id": job.id, "status": job.status}

    # -- X-3: auto_translate.py:362-374 (one poll step; the loop lives
    # in streaming.poller, shared with the local transport) ------------
    def retrieve(self, job_id: str) -> dict:
        job = self.client.batches.retrieve(job_id)
        return {
            "id": job.id,
            "status": job.status,
            "output_file_id": getattr(job, "output_file_id", None),
        }

    # -- X-4: auto_translate.py:377-389 -------------------------------
    def download(self, file_id: str, dest: str) -> str:
        content = self.client.files.content(file_id).content
        Path(dest).parent.mkdir(parents=True, exist_ok=True)
        Path(dest).write_bytes(content)
        return dest


def run_batch_lifecycle(
    spark: SparkSession,
    requests: DataFrame,
    transport,
    ledger,
    work_dir: str,
    batch_id: str = "run",
    target_language: str | None = None,
    poll_interval_secs: int = 0,
    max_polls: int = 60,
) -> DataFrame | None:
    """The reference's §3.1 submit→poll→fetch spine on the transport
    protocol (``run_translation_pipeline``, ``auto_translate.py:
    1761-1857``): serialize requests (R-6b), upload (X-1), submit
    (X-2) + ledger append, poll to a terminal status with ledger
    transitions (X-3), download + ingest responses (X-4).

    Returns the response DataFrame (custom_id, status_code, content,
    error, _corrupt_record), or None when the job failed / the download
    failed — in both cases the ledger records the terminal status, which
    is the contract the folder orchestrator consumes.
    """
    from .sources.readers import read_response_jsonl
    from .sources.writers import write_request_jsonl
    from .streaming.poller import poll_until_drained

    req_path = os.path.join(work_dir, "requests.jsonl")
    write_request_jsonl(requests, req_path)
    file_id = transport.upload_file(req_path)                      # X-1
    job = transport.create_batch(file_id)                          # X-2
    job_id = job["id"]
    ledger.append(
        [
            {
                "batch_id": batch_id,
                "input_file": req_path,
                "job_id": job_id,
                "status": "submitted",
                "target_language": target_language,
            }
        ]
    )
    poll_until_drained(                                            # X-3
        spark,
        ledger,
        lambda jid: transport.retrieve(jid)["status"],
        interval_secs=poll_interval_secs,
        max_polls=max_polls,
    )
    current = ledger.get(job_id)
    if current is None or current["status"] != "completed":
        return None
    out_id = transport.retrieve(job_id)["output_file_id"]
    dest = os.path.join(work_dir, "responses.jsonl")
    try:                                                           # X-4
        transport.download(out_id, dest)
    except OSError:
        ledger.update_status(job_id, "download_failed")
        return None
    return read_response_jsonl(spark, dest)


__all__ = [
    "LocalBatchTransport",
    "OpenAIBatchTransport",
    "run_batch_lifecycle",
]
