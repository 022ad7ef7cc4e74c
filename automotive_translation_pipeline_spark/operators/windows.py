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


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    ndigits: int = 4,
) -> DataFrame:
    """Time-weighted average of a sampled value per key (TWAP): each
    observation holds until the next one, so it weighs by its holding
    interval; the final observation of a key carries zero weight
    (nothing it holds over). Keys with a single event yield NULL — no
    interval exists, surfaced rather than coerced to the plain mean.

    One keyed shuffle (lead window), then a map-side-combined rollup.
    """
    # dt in EXACT integer microseconds (cast through TIMESTAMP under
    # the session's pinned UTC): TWAP is a ratio, so the time unit
    # cancels, and integer micros make the weighted sums — hence the
    # rounding — bit-identical across engines (fractional epoch()
    # seconds are already lossy doubles before the subtraction).
    w = Window.partitionBy(key_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    step = events.select(
        F.col(key_col),
        F.col(value_col),
        (
            F.lead(us).over(w) - us
        ).cast("double").alias("__dt"),
    ).filter(F.col("__dt").isNotNull())
    return step.groupBy(key_col).agg(
        F.round(
            F.sum(F.col(value_col) * F.col("__dt")) / F.sum("__dt"), ndigits
        ).alias("twap"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def cumulative_unique(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Running count of distinct keys ever seen, by day — the
    growth-curve query ("cumulative unique users"). The naive
    count(DISTINCT) OVER (ORDER BY day) is quadratic state; the
    scale shape is: keep each key's FIRST occurrence only (row_number
    over the key partition), collapse to per-day first-appearance
    counts, then one cumulative window over the tiny day-level series.

    Returns (day, new_keys, cumulative_keys).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    firsts = (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.to_date(ts_col).alias("day"))
    )
    daily = firsts.groupBy("day").agg(F.count(F.lit(1)).alias("new_keys"))
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.withColumn(
        "cumulative_keys", F.sum("new_keys").over(w_cum)
    )


def attribution_models(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    touch_type: str = "view",
    convert_type: str = "purchase",
    value_col: str = "value",
    window_minutes: int = 30,
    ndigits: int = 2,
) -> DataFrame:
    """Three marketing-attribution models over the same touch window,
    side by side: for each conversion, credit the touches (``view``)
    in the preceding ``window_minutes`` under FIRST-touch, LAST-touch,
    and LINEAR (equal-split) rules, then roll credited value up per
    touch. Output is per-touch-event credit under each model — the
    comparison table an attribution analysis starts from.

    Scale shape: one interval join keyed on the user (the same shape
    as the stream-stream attribution job), then window ranks WITHIN
    each conversion's touch set (bounded by the window's touch count)
    and a per-touch rollup. Deterministic tie-breaks on event id.

    Returns (touch_id, first_credit, last_credit, linear_credit)
    rounded; every credited conversion contributes its full value
    exactly once per model.
    """
    touches = events.filter(F.col(type_col) == touch_type).select(
        F.col(user_col).alias("u"),
        F.col("event_id").alias("touch_id"),
        F.col(ts_col).alias("t_ts"),
    )
    convs = events.filter(F.col(type_col) == convert_type).select(
        F.col(user_col).alias("u"),
        F.col("event_id").alias("conv_id"),
        F.col(ts_col).alias("c_ts"),
        F.col(value_col).alias("v"),
    )
    joined = touches.join(convs, "u").filter(
        (F.col("t_ts") <= F.col("c_ts"))
        & (
            F.col("t_ts")
            >= F.col("c_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES")
        )
    )
    w_conv = Window.partitionBy("conv_id")
    w_asc = w_conv.orderBy("t_ts", "touch_id")
    w_desc = w_conv.orderBy(F.col("t_ts").desc(), F.col("touch_id").desc())
    credited = joined.select(
        "touch_id",
        "v",
        (F.row_number().over(w_asc) == 1).alias("__is_first"),
        (F.row_number().over(w_desc) == 1).alias("__is_last"),
        F.count(F.lit(1)).over(w_conv).alias("__n_touches"),
    )
    return credited.groupBy("touch_id").agg(
        F.round(
            F.sum(F.when(F.col("__is_first"), F.col("v")).otherwise(0.0)),
            ndigits,
        ).alias("first_credit"),
        F.round(
            F.sum(F.when(F.col("__is_last"), F.col("v")).otherwise(0.0)),
            ndigits,
        ).alias("last_credit"),
        F.round(
            F.sum(F.col("v") / F.col("__n_touches")), ndigits
        ).alias("linear_credit"),
    )
