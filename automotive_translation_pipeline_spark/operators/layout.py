"""Multi-dimensional data layout: z-order clustering keys.

A single-column sort (``write_layout(sort_by=...)``) makes parquet
row-group min/max stats selective for that one column only. When scans
filter on TWO OR MORE columns (time + tenant, part + supplier), the
lakehouse answer is z-ordering: map each column to a bounded integer,
interleave their bits, and sort by the interleaved key. Rows close in
z-value are close in every dimension, so each file covers a small
rectangle of the filter space and min/max stats prune on all the
z-ordered columns at once — the same layout Delta's OPTIMIZE ZORDER
produces.

Everything here is native column expressions: the per-column ranges
come from one tiny aggregate broadcast back into the plan (no driver
collect), normalization + bit interleaving are shifts and masks inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(norms: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each normalized int column:
    bit b of column i lands at position b * n_cols + i."""
    n = len(norms)
    out = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(norms):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return out


def with_zorder_key(
    df: DataFrame,
    cols: tuple[str, ...],
    bits: int = 8,
    key_name: str = "__zkey",
) -> DataFrame:
    """Add a z-order key over ``cols`` (numeric/timestamp-castable).

    Per-column min/max come from ONE aggregate over the input,
    broadcast back in-plan; each value is scaled linearly to
    ``[0, 2^bits)`` and the bits are interleaved. Linear scaling is the
    standard approximation (skewed columns get skewed cells but stats
    still prune); 8 bits/column keeps the key in a bigint for up to 7
    columns.
    """
    if not 1 <= len(cols) * bits <= 63:
        raise ValueError("len(cols) * bits must fit in a signed 64-bit key")
    as_num = {c: F.col(c).cast("double") for c in cols}
    ranges = df.agg(
        *[
            agg.alias(f"__{nm}_{c}")
            for c in cols
            for nm, agg in (("min", F.min(as_num[c])), ("max", F.max(as_num[c])))
        ]
    )
    top = (1 << bits) - 1
    norms = [
        F.least(
            F.lit(top).cast("bigint"),
            F.floor(
                (as_num[c] - F.col(f"__min_{c}"))
                / (F.col(f"__max_{c}") - F.col(f"__min_{c}") + F.lit(1e-12))
                * (top + 1)
            ).cast("bigint"),
        )
        for c in cols
    ]
    return (
        df.join(F.broadcast(ranges))
        .withColumn(key_name, _interleave(norms, bits))
        .drop(*[f"__{nm}_{c}" for c in cols for nm in ("min", "max")])
    )
