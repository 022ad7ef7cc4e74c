"""Window / ordered-neighbor operators (SURVEY §2.6: R-25..R-29).

All windows partition by a key (batch_id / user_id / job_id) — never a
global order — so they scale: each partition's window evaluates
independently after one shuffle on the partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def last_wins(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """R-25: collapse duplicate keys keeping the LAST occurrence in
    ``order_col`` order — the reference's dict-overwrite contract
    (``auto_translate.py:514-518``). ``dropDuplicates`` would keep an
    arbitrary row; the explicit window keeps the contract."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shift_flags(
    df: DataFrame,
    batch_col: str = "batch_id",
    order_col: str = "seq",
    failed_col: str = "is_failed",
) -> DataFrame:
    """R-26 + R-27: flag likely off-by-one ("shifted") translations.

    Reference (``auto_translate.py:1012-1032``): within a batch in input
    order, a failed row followed by a clean row — or a failed *last* row
    preceded by a clean row — suggests the LLM shifted ids by one.
    """
    w = Window.partitionBy(batch_col).orderBy(order_col)
    failed = F.col(failed_col)
    next_ok = ~F.coalesce(F.lead(failed).over(w), F.lit(True))
    prev_ok = ~F.coalesce(F.lag(failed).over(w), F.lit(True))
    is_last = F.row_number().over(
        Window.partitionBy(batch_col).orderBy(F.col(order_col).desc())
    ) == 1
    return df.withColumn(
        "shift_suspect",
        (failed & next_ok) | (failed & is_last & prev_ok),
    )


def topk_recent(df: DataFrame, ts_col: str, k: int = 5, tiebreak: str | None = None) -> DataFrame:
    """R-28: most-recent-k rows (reference ``batch_tracker.py:132-140``).
    Spark turns orderBy+limit into TakeOrderedAndProject — a per-partition
    top-k plus a k-row merge, no global sort. A tiebreak column keeps the
    result deterministic when timestamps collide."""
    order: list[Column] = [F.col(ts_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    return df.orderBy(*order).limit(k)


def sequence_check(
    df: DataFrame,
    batch_col: str,
    order_col: str,
    number_col: str,
) -> DataFrame:
    """R-29: per batch, parsed line numbers must equal 1..n in order
    (reference ``old_functionalities/check_and_process.py:296-310``).
    Emits the violating rows with the expected number."""
    w = Window.partitionBy(batch_col).orderBy(order_col)
    return (
        df.withColumn("expected_number", F.row_number().over(w))
        .filter(F.col(number_col) != F.col("expected_number"))
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their
    first event; for each (cohort_week, week_offset) the number of
    distinct cohort users active that many weeks later.

    Scale shape: first-event timestamp attaches as a min() window over
    the user partition (ONE shuffle on user_id — no groupBy+re-join of
    the event stream), then the rollup collapses to
    (cohort, offset, user) map-side before the distinct count. Nothing
    is corpus-wide except those keyed shuffles; skewed users cost one
    window partition each.

    Returns (cohort_week DATE, week_offset BIGINT, n_users BIGINT).
    """
    w = Window.partitionBy(user_col)
    base = events.select(
        F.col(user_col),
        F.to_date(ts_col).alias("__d"),
        F.min(ts_col).over(w).alias("__first_ts"),
    )
    cohort = F.date_trunc("week", F.col("__first_ts")).cast("date")
    offset = F.floor(F.datediff(F.col("__d"), cohort) / 7)
    return (
        base.select(
            cohort.alias("cohort_week"),
            offset.alias("week_offset"),
            F.col(user_col),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def markov_transitions(
    events: DataFrame,
    partition_col: str = "user_id",
    order_cols: list[str] | None = None,
    state_col: str = "event_type",
    ndigits: int = 4,
) -> DataFrame:
    """First-order Markov transition matrix of the per-key event
    sequence: P(next_state | state) estimated over every adjacent pair,
    plus the raw pair count. The behavioral fingerprint behind
    next-event features, bot detection (degenerate transition rows),
    and funnel drop-off.

    Scale shape: lead() over the key partition (one keyed shuffle of
    the stream), collapsed map-side to (state, next_state, n); the
    denominator attaches as a window over the collapsed matrix —
    states² rows, negligible. Sequence ends (lead = NULL) drop out of
    the matrix on both engines.

    Returns (state, next_state, n_pairs, p) with p rounded.
    """
    order_cols = order_cols or ["ts", "event_id"]
    w = Window.partitionBy(partition_col).orderBy(*order_cols)
    pairs = (
        events.select(
            F.col(state_col).alias("state"),
            F.lead(state_col).over(w).alias("next_state"),
        )
        .filter(F.col("next_state").isNotNull())
        .groupBy("state", "next_state")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    return pairs.withColumn(
        "p",
        F.round(
            F.col("n_pairs")
            / F.sum("n_pairs").over(Window.partitionBy("state")),
            ndigits,
        ),
    )
