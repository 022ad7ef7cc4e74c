"""The flagship pipeline as a streaming service (SURVEY §3.1 + §2.11).

CSV files land in a watched folder (the reference's operational reality:
``batch_auto_translate`` pointed at a directory); each micro-batch runs
the SAME ``translate_docs`` fragment as the batch flagship via
``foreachBatch``, appends row-level results to a parquet sink, and
records per-micro-batch job status in the ledger — submitted on entry,
completed/failed on exit, exactly the reference's §1.6 state machine.

foreachBatch (not a pure streaming plan) is the right tool here: the
pack window and the grouped translate UDF need full-micro-batch
semantics, and results must commit atomically with ledger updates.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..ledger import Ledger
from ..plans.pipeline import translate_docs
from ..schemas import DESCRIPTIONS


def run_streaming_translation(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    checkpoint: str,
    ledger: Ledger | None = None,
    limit: int = 4000,
    trigger_secs: int | None = None,
) -> StreamingQuery:
    """Start the service. ``trigger_secs=None`` → availableNow (drain
    what's there and stop — the test/backfill mode); otherwise a
    processing-time trigger (the reference's 300 s cadence)."""
    stream = (
        spark.readStream.schema(DESCRIPTIONS)
        .option("header", True)
        .option("maxFilesPerTrigger", 16)
        .csv(f"{input_dir}/*.csv")
    )

    def process(batch_df, micro_batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        job_id = f"batch_mb{micro_batch_id}"
        if ledger is not None:
            ledger.append(
                [
                    {
                        "batch_id": f"stream_{micro_batch_id}",
                        "input_file": input_dir,
                        "job_id": job_id,
                        "status": "in_progress",
                        "timestamp": int(time.time()),
                        "target_language": "mock",
                    }
                ]
            )
        try:
            docs = (
                batch_df.filter(F.length(F.trim("english_sentence")) > 0)
                .withColumn("english_sentence", F.trim("english_sentence"))
                # Shard per micro-batch: batch ids stay unique across
                # triggers without global coordination.
                .withColumn("shard", F.lit(f"mb{micro_batch_id}"))
                .withColumn(
                    "seq",
                    F.row_number().over(
                        Window.partitionBy("shard").orderBy("description_id")
                    ),
                )
            )
            result = translate_docs(docs, limit=limit).select(
                "batch_id",
                "description_id",
                "english_sentence",
                "translation",
                "is_failed",
                "is_suspicious",
                "shift_suspect",
            )
            result.write.mode("append").parquet(output_path)
            if ledger is not None:
                ledger.update_status(job_id, "completed", output_file=output_path)
        except Exception:
            if ledger is not None:
                ledger.update_status(job_id, "failed")
            raise

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if trigger_secs is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_secs} seconds")
    return writer.queryName("streaming_translation").start()
