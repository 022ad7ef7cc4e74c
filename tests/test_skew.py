"""Skew-salting tests: result parity with the plain join + the salt
actually spreads the hot key across partitions."""

from __future__ import annotations

import pyspark.sql.functions as F

from automotive_translation_pipeline_spark.operators.skew import (
    salted_join,
    skew_stats,
)


def _skewed(spark):
    # One hot key (90% of rows) + a long tail.
    hot = [(1, f"hot{i}") for i in range(900)]
    tail = [(k, f"t{k}") for k in range(2, 102)]
    big = spark.createDataFrame(hot + tail, "k long, payload string")
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 102)], "k long, name string"
    )
    return big, dim


def test_skew_stats_flags_hot_key(spark):
    big, _ = _skewed(spark)
    top = skew_stats(big, "k", top=1).first()
    assert top["k"] == 1 and top["n"] == 900
    assert top["skew_factor"] > 50


def test_salted_join_matches_plain_join(spark):
    big, dim = _skewed(spark)
    plain = (
        big.join(dim, "k").select("k", "payload", "name").collect()
    )
    salted = salted_join(big, dim, "k", factor=8).select(
        "k", "payload", "name"
    ).collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_salt_spreads_hot_key(spark):
    big, dim = _skewed(spark)
    salted = big.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(8)),
    )
    spread = (
        salted.filter(F.col("k") == 1)
        .groupBy("__salt")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    # The hot key's 900 rows land in (nearly) all 8 salt buckets.
    assert len(spread) >= 6
    assert max(r["n"] for r in spread) < 900  # no single straggler bucket
