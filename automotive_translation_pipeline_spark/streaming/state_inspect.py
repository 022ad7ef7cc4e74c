"""Streaming state observability: the State Data Source reader.

A production streaming service (streaming/flagship.py) owns two kinds
of on-disk truth: its sinks and its CHECKPOINT STATE. When a query
misbehaves — watermark stuck, state growing without bound, one hot key
dominating a partition — the state itself is the thing to inspect, and
before Spark 4 the only way in was stopping the query and adding debug
sinks. The `statestore` / `state-metadata` formats read the checkpoint
directly, as plain DataFrames, while the query keeps running.

These helpers wrap the two formats with the engine's conventions:

* `state_metadata(spark, ck)` — one row per stateful operator: name,
  store, partition count, batch-id range (what exists at all);
* `state_rows(spark, ck, ...)` — the keyed state itself (key struct,
  value struct, partition_id), optionally pinned to an operator/batch;
* `state_skew(spark, ck)` — keys per state partition: the direct
  answer to "is one partition holding all the state" (the streaming
  twin of operators/skew.py:skew_stats).

Scale note: the reader scans only the checkpoint's state files for the
requested snapshot — cost is proportional to live state, not to the
stream's history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operators with state in this checkpoint (name, store,
    partitions, min/max batch)."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_rows(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    batch_id: int | None = None,
    store_name: str | None = None,
) -> DataFrame:
    """The keyed state of one operator: (key struct, value struct,
    partition_id). Defaults to the latest committed batch."""
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    return r.load(checkpoint)


def state_skew(
    spark: SparkSession, checkpoint: str, operator_id: int = 0
) -> DataFrame:
    """Keys per state partition, descending — a one-glance answer to
    whether state is balanced across the operator's partitions."""
    return (
        state_rows(spark, checkpoint, operator_id)
        .groupBy("partition_id")
        .agg(F.count("*").alias("n_keys"))
        .orderBy(F.desc("n_keys"), F.asc("partition_id"))
    )
