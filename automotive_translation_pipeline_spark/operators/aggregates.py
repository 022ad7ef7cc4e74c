"""Aggregation operators (SURVEY §2.5: R-20..R-24).

All are single-pass ``agg(count(when(...)))`` families — map-side partial
aggregation handles the 100 TB case; no distinct-aggregates, no
high-cardinality groupings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_summary(
    results: DataFrame,
    failed_col: str = "is_failed",
    suspicious_col: str = "is_suspicious",
    shifted_col: str = "shift_suspect",
) -> DataFrame:
    """R-20: run summary — success/failed/suspicious/shifted counts and a
    success-rate percent (reference ``auto_translate.py:955-1135``,
    rates at ``:1060,1076``)."""
    total = F.count("*")
    failed = F.count(F.when(F.col(failed_col), 1))
    return results.agg(
        total.alias("total_rows"),
        (total - failed).alias("successful"),
        failed.alias("failed"),
        F.count(F.when(F.col(suspicious_col), 1)).alias("suspicious"),
        F.count(F.when(F.col(shifted_col), 1)).alias("shift_suspects"),
        F.round((total - failed) * 100.0 / total, 2).alias("success_rate_pct"),
    )


def error_rollup(responses: DataFrame, error_type_col: str = "error_type") -> DataFrame:
    """R-21: per-error-type counts + share — the reference accumulates
    these in seven Python lists (``auto_translate.py:1504-1543``); one
    groupBy with a window share replaces the whole pass."""
    counts = responses.groupBy(error_type_col).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            error_type_col,
            "n",
            F.round(F.col("n") * 100.0 / F.col("t"), 2).alias("pct"),
        )
    )


def group_counts(df: DataFrame, col: str) -> DataFrame:
    """R-22/R-23/R-24: the groupBy-count family (ledger status counts,
    language counts, per-batch extraction counts)."""
    return df.groupBy(col).agg(F.count("*").alias("n"))
