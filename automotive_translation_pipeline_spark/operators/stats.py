"""Grouped statistical modeling: per-group OLS trend fits and robust
(median/MAD) outlier scoring.

Training-data operations lean on both: regression slopes catch drift
(is this source's document length trending down? is a metric decaying
within a cohort?), and MAD-based robust z-scores are the standard
outlier gate when the data itself contains the outliers that would
poison a mean/stddev gate.

Scale shape: OLS per group is ONE partially-aggregated groupBy — the
`regr_*` aggregates are plain moment sums under the hood, so the map
side combines and only (groups) rows shuffle. The MAD path is built
from RANK-BASED medians (row_number + count windows + an explicit
(a+b)/2 of the middle elements) rather than the engines' median()
aggregates: the built-ins interpolate with engine-specific arithmetic
((a+b)/2 vs a+(b-a)/2 — a 1-ulp difference that, amplified through
(v - med)/mad, flipped a 4-decimal rounding boundary on 1 row in a
million at sf1), while the explicit form is the same IEEE expression
tree on every engine and therefore bit-identical. Cost: keyed-window
shuffles on the same group key, which Catalyst plans as one exchange
reused across the windows; exact medians over a skewed group cost that
group's partition.
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


def _with_rank_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str,
    order_extra: list[str],
) -> DataFrame:
    """Attach the group's exact median as an EXPLICIT (a+b)/2 over the
    rank-selected middle elements (a == b for odd counts). avg() over
    the <= 2 middle rows is sum/count with IEEE-commutative addition —
    deterministic and engine-portable, unlike built-in median()'s
    interpolation arithmetic. One keyed shuffle (rank + count windows
    share the group exchange) plus a broadcast-sized per-group join."""
    w_rank = Window.partitionBy(*group_cols).orderBy(value_col, *order_extra)
    w_grp = Window.partitionBy(*group_cols)
    ranked = df.withColumn("__rn", F.row_number().over(w_rank)).withColumn(
        "__cnt", F.count(F.lit(1)).over(w_grp)
    )
    mid = ranked.filter(
        (F.col("__rn") == F.floor((F.col("__cnt") + 1) / 2))
        | (F.col("__rn") == F.floor(F.col("__cnt") / 2) + 1)
    )
    med = mid.groupBy(*group_cols).agg(F.avg(value_col).alias(out_col))
    return ranked.drop("__rn", "__cnt").join(F.broadcast(med), group_cols)


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z_cutoff: float = 3.5,
    ndigits: int = 4,
) -> DataFrame:
    """Robust z-score per row: 0.6745 * (v - median) / MAD within the
    group (the modified z-score of Iglewicz & Hoaglin), flagged at
    |z| >= z_cutoff. Both medians are rank-based explicit forms (see
    module docstring), so the score — and its rounding — is a pure
    deterministic function of the input on any engine.

    MAD == 0 (constant-majority group) yields NULL z and no flag —
    every value equals the median or is infinitely far by this metric;
    surfacing NULL beats inventing a scale.
    """
    with_med = _with_rank_median(
        df, group_cols, value_col, "__med", order_extra=[]
    )
    with_dev = with_med.withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("__med"))
    )
    with_mad = _with_rank_median(
        with_dev, group_cols, "__dev", "__mad", order_extra=[value_col]
    )
    # Quantize with explicit floor arithmetic rather than round():
    # engines implement round-half differently (Spark: exact BigDecimal
    # HALF_UP; DuckDB: float-scaled nearbyint), so the same raw double
    # can round to different 4th decimals at a boundary — observed on
    # 1 row in a million at sf1. floor(x*10^d + 0.5)/10^d is the same
    # IEEE op sequence everywhere, hence bit-identical.
    scale = float(10**ndigits)
    raw = (
        F.lit(0.6745)
        * (F.col(value_col) - F.col("__med"))
        / F.when(F.col("__mad") > 0, F.col("__mad"))
    )
    z = F.floor(raw * scale + 0.5) / scale
    return (
        with_mad.withColumn("robust_z", z)
        .withColumn(
            "is_outlier",
            F.when(
                F.col("robust_z").isNotNull(),
                F.abs(F.col("robust_z")) >= z_cutoff,
            ),
        )
        .drop("__med", "__mad", "__dev")
    )


def grouped_quantiles_disc(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT discrete quantiles per group: for each q the element at
    rank ceil(q * n) of the sorted values — an actual data value, no
    interpolation, hence bit-identical on every engine (the lesson
    from mad_outliers applied as a reusable primitive).

    Round 10 (guide §2.3/§2.4): rank selection over the VALUE
    HISTOGRAM, not a row_number sort of the stream. The value at rank
    ceil(q*n) of a sorted multiset is the smallest v whose cumulative
    count reaches the rank — computed from a map-side-combined
    ``groupBy(group, value).count()`` plus one cumulative window over
    DISTINCT (group, value) rows (~hundreds for integer metrics,
    never more than the stream for continuous ones). The old form
    sorted the whole stream per group — a 5-group corpus sort with
    5-way parallelism — and its per-q union branches re-ran that sort
    (ReuseExchange dedups only the exchange, not the WindowExec above
    it: 3 qs = 3 full sorts). All qs now resolve in ONE pass via an
    array filter; a row can satisfy several qs (tiny groups) and
    yields one output row per matching q, exactly like the old
    per-q selects. ``tiebreak_cols`` is retained for API
    compatibility but unused: tie order among equal values can never
    change the value at a rank, and only values are returned.
    Returns group_cols + (q, value).
    """
    del tiebreak_cols
    hist = df.groupBy(
        *group_cols, F.col(value_col).alias("__v")
    ).agg(F.count(F.lit(1)).alias("__c"))
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_grp = Window.partitionBy(*group_cols)
    cum = hist.withColumn("__cum", F.sum("__c").over(w_cum)).withColumn(
        "__tot", F.sum("__c").over(w_grp)
    )
    q_arr = F.array(*[F.lit(float(q)) for q in qs])
    hit = lambda q: (  # noqa: E731 — rank lands inside this value's run
        (F.col("__cum") >= F.ceil(q * F.col("__tot")))
        & ((F.col("__cum") - F.col("__c")) < F.ceil(q * F.col("__tot")))
    )
    return cum.select(
        *group_cols,
        F.explode(F.filter(q_arr, hit)).alias("q"),
        F.col("__v").alias("value"),
    )
