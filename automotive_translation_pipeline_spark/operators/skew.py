"""Skew handling (SCALE.md / ROADMAP #5).

AQE's skew-join splitting handles most cases at runtime; this module is
the explicit fallback for the cases AQE can't fix:

* ``salted_join`` — classic key salting for a skewed equi-join: the
  skewed (big) side gets a random-but-deterministic salt in
  ``[0, factor)``; the build side is replicated ``factor`` times; the
  join key becomes (key, salt). One hot key's rows now spread over
  ``factor`` tasks instead of one straggler.
* ``skew_stats`` — the diagnosis: per-key row counts + a skew factor
  (max/avg) so callers decide whether salting is worth the replication.

Salting is correct for inner/left joins where the build side is
replicated; aggregations after the join must ignore the salt column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_stats(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Per-key counts + global skew factor (max key count / mean)."""
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    overall = counts.agg(
        F.max("n").alias("max_n"), F.avg("n").alias("avg_n")
    )
    return (
        counts.crossJoin(F.broadcast(overall))
        .withColumn("skew_factor", F.round(F.col("max_n") / F.col("avg_n"), 2))
        .orderBy(F.col("n").desc())
        .limit(top)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    The salt is ``pmod(hash(whole row), factor)`` — deterministic per
    row, uniform across the hot key's rows. Output schema = the plain
    join's schema (salt columns dropped).
    """
    big_salted = big.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(factor))
    )
    small_replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    joined = big_salted.join(small_replicated, [key, "__salt"], how)
    return joined.drop("__salt")
