"""Grouped statistical modeling: per-group OLS trend fits and robust
(median/MAD) outlier scoring.

Training-data operations lean on both: regression slopes catch drift
(is this source's document length trending down? is a metric decaying
within a cohort?), and MAD-based robust z-scores are the standard
outlier gate when the data itself contains the outliers that would
poison a mean/stddev gate.

Scale shape: OLS per group is ONE partially-aggregated groupBy — the
`regr_*` aggregates are plain moment sums under the hood, so the map
side combines and only (groups) rows shuffle. MAD needs two exact
medians (value, then |value - median|), expressed as two windows over
the SAME group partitioning — Catalyst reuses the single exchange, so
the cost is one keyed shuffle plus in-partition sorts, never a global
one. Exact medians over a skewed group cost that group's partition;
for billion-row groups swap in approx_percentile via the `exact=False`
seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_ols(
    df: DataFrame,
    group_cols: list[str],
    y_col: str,
    x_col: str,
    ndigits: int = 4,
) -> DataFrame:
    """Per-group least-squares fit of y on x: slope, intercept, r2, n.

    One shuffle, map-side combined; `regr_*` are native JVM aggregates
    (no Python). Groups with zero x-variance yield NULL slope —
    surfaced, not coerced, so callers see degenerate fits.
    """
    return df.groupBy(*group_cols).agg(
        F.round(F.regr_slope(F.col(y_col), F.col(x_col)), ndigits).alias("slope"),
        F.round(
            F.regr_intercept(F.col(y_col), F.col(x_col)), ndigits
        ).alias("intercept"),
        F.round(F.regr_r2(F.col(y_col), F.col(x_col)), ndigits).alias("r2"),
        F.count(F.lit(1)).alias("n"),
    )


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z_cutoff: float = 3.5,
    exact: bool = True,
    ndigits: int = 4,
) -> DataFrame:
    """Robust z-score per row: 0.6745 * (v - median) / MAD within the
    group (the modified z-score of Iglewicz & Hoaglin), flagged at
    |z| >= z_cutoff. The flag is computed from the ROUNDED z so the
    boundary is a pure deterministic function, identical in the SQL
    oracle.

    MAD == 0 (constant-majority group) yields NULL z and no flag —
    every value equals the median or is infinitely far by this metric;
    surfacing NULL beats inventing a scale.
    """
    w = Window.partitionBy(*group_cols)
    med_fn = (
        (lambda c: F.median(c))
        if exact
        else (lambda c: F.percentile_approx(c, 0.5))
    )
    with_med = df.withColumn("__med", med_fn(F.col(value_col)).over(w))
    with_mad = with_med.withColumn(
        "__mad", med_fn(F.abs(F.col(value_col) - F.col("__med"))).over(w)
    )
    z = F.round(
        F.lit(0.6745)
        * (F.col(value_col) - F.col("__med"))
        / F.when(F.col("__mad") > 0, F.col("__mad")),
        ndigits,
    )
    return (
        with_mad.withColumn("robust_z", z)
        .withColumn(
            "is_outlier",
            F.when(
                F.col("robust_z").isNotNull(),
                F.abs(F.col("robust_z")) >= z_cutoff,
            ),
        )
        .drop("__med", "__mad")
    )
