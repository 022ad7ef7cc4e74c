"""Token-aware batch packing (SURVEY §2.4: R-17, R-18, R-19) — the
reference's signature operator.

The reference packs rows greedily into batches whose estimated token cost
(input + 1.8x expected output) stays under MODEL_TOKEN_LIMIT=4000
(``create_jsonl_from_csv``, ``auto_translate.py:278-301``; constants
``:31-32``).

Two formulations, both deterministic:

* ``assign_batches_cumsum`` — pure window prefix-sum: batch =
  ``floor(cumulative_cost / limit)``. Fully parallel per shard; batches
  can overshoot the limit by at most one row's cost (documented
  determinism contract, SURVEY §7 watch list). This is the 100 TB path:
  shard by a partition column (source file, date, …) and each shard packs
  independently with no global coordination.
* ``assign_batches_greedy`` — exact greedy loop via ``applyInPandas``
  per shard: bit-identical to the reference's packer semantics (close
  the batch *before* the row that would overflow). Arrow-batched; one
  Python pass per shard.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import estimated_cost

MODEL_TOKEN_LIMIT = 4000  # reference auto_translate.py:31
EXPECTED_OUTPUT_FACTOR = 1.8  # reference auto_translate.py:32


def with_cost(
    df: DataFrame,
    text_col: str,
    cost_col: str = "cost",
    output_factor: float = EXPECTED_OUTPUT_FACTOR,
) -> DataFrame:
    """Attach the R-17 packing cost estimate to each row."""
    return df.withColumn(cost_col, estimated_cost(F.col(text_col), output_factor))


def assign_batches_cumsum(
    df: DataFrame,
    order_col: str,
    cost_col: str = "cost",
    limit: int = MODEL_TOKEN_LIMIT,
    shard_col: str | None = None,
    batch_col: str = "batch_id",
) -> DataFrame:
    """Prefix-sum batch assignment: ``batch = floor(cumsum(cost)/limit)``.

    With ``shard_col`` the window partitions by shard and batch ids are
    ``(shard, local_batch)`` pairs — no global ordering, no single-task
    bottleneck, survives 1000 executors.

    PRECONDITION: ``cost_col`` must carry at most ONE decimal place
    (integer token counts times a 1-decimal overhead factor, as
    produced by this module). The prefix sum runs over integer TENTHS
    for engine-exact batch boundaries, so finer-grained costs are
    silently quantized to 0.1 — callers with sub-tenth costs must
    rescale to their own integer grid first.
    """
    if shard_col:
        w = Window.partitionBy(shard_col).orderBy(order_col)
    else:
        w = Window.orderBy(order_col)
    # The prefix sum runs over INTEGER TENTHS of the cost, not the
    # float cost: engines accumulate float window sums in different
    # orders (sequential vs segment tree), and at sf3 magnitudes
    # (~7M cumulative) the drift crossed batch boundaries — 14
    # off-by-one batch ids against the DuckDB oracle. Per-row
    # cost*10 is within 1 ulp of an integer for any integer token
    # count (cost = toks*(1+factor)), so round() lands identically on
    # both engines, and integer sums are exact at ANY scale. For
    # already-integer costs (chunk packing) this is bit-identical to
    # the old float formula.
    cost_tenths = F.round(F.col(cost_col) * 10, 0).cast("long")
    cum = F.sum(cost_tenths).over(w.rowsBetween(Window.unboundedPreceding, 0))
    local = F.floor((cum - F.lit(1)) / F.lit(limit * 10)).cast("long")
    if shard_col:
        batch = F.concat_ws("-", F.col(shard_col), local.cast("string"))
    else:
        batch = local.cast("string")
    return df.withColumn(batch_col, batch)


def assign_batches_greedy(
    df: DataFrame,
    order_col: str,
    cost_col: str = "cost",
    limit: int = MODEL_TOKEN_LIMIT,
    shard_col: str | None = None,
    batch_col: str = "batch_id",
    prompt_cost: float = 0.0,
) -> DataFrame:
    """Exact greedy packing, reference-faithful: a batch closes when the
    next row would push the running total past ``limit``; a single row
    larger than the limit still forms its own batch.

    Runs as one ordered pass per shard (``applyInPandas``). Without a
    shard column everything is one group — correct, but serial; at scale
    always pass a shard.
    """
    shard = shard_col or "__shard"
    work = df if shard_col else df.withColumn(shard, F.lit(0))
    fields = ", ".join(f"{n} {t}" for n, t in work.dtypes)
    out_schema = f"{fields}, {batch_col} string"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        ids = []
        batch_n, running = 0, prompt_cost
        for cost in pdf[cost_col]:
            if running + cost > limit and running > prompt_cost:
                batch_n += 1
                running = prompt_cost
            running += cost
            ids.append(batch_n)
        shard_val = str(pdf[shard].iloc[0])
        pdf[batch_col] = [f"{shard_val}-{b}" for b in ids]
        return pdf

    packed = work.repartition(shard).groupBy(shard).applyInPandas(pack, out_schema)
    return packed.drop("__shard") if not shard_col else packed


def materialize_requests(
    assigned: DataFrame,
    id_col: str = "description_id",
    text_col: str = "english_sentence",
    batch_col: str = "batch_id",
    system_prompt: str = "",
    model: str = "gpt-4o",
    max_tokens: int = MODEL_TOKEN_LIMIT,
) -> DataFrame:
    """R-18: one request row per batch — ``custom_id`` + JSON-map payload
    + full API body struct (reference ``auto_translate.py:303-332``).

    The payload map preserves within-batch order via sorted collect on
    the order the packer assigned (collect_list is non-deterministic
    across retries, so entries are sorted by id for stability).
    """
    per_batch = assigned.groupBy(batch_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col(id_col), F.col(text_col))))
        ).alias("payload"),
        F.collect_list(F.col(id_col)).alias("description_ids"),  # R-19 mapping
        F.count("*").alias("n_rows"),
    )
    body = F.struct(
        F.lit(model).alias("model"),
        F.array(
            F.struct(F.lit("system").alias("role"), F.lit(system_prompt).alias("content")),
            F.struct(
                F.lit("user").alias("role"),
                F.to_json(F.col("payload")).alias("content"),
            ),
        ).alias("messages"),
        F.lit(0.0).alias("temperature"),
        F.lit(max_tokens).alias("max_tokens"),
    )
    return per_batch.select(
        F.col(batch_col).alias("custom_id"),
        F.lit("POST").alias("method"),
        F.lit("/v1/chat/completions").alias("url"),
        body.alias("body"),
        "payload",
        "description_ids",
        "n_rows",
    )
