"""Unit tests for the custom join operators Spark lacks natively:
as-of (point-in-time) join and binned range join. The catalog queries
asof_purchase_last_view / range_join_error_windows oracle-check them at
table scale; these pin the semantics on hand-built rows."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from automotive_translation_pipeline_spark.operators.joins import (
    asof_join,
    range_join_binned,
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_semantics(spark):
    prices = spark.createDataFrame(
        [
            ("A", _ts(0), 100.0),
            ("A", _ts(10), 110.0),
            ("A", _ts(20), 120.0),
            ("B", _ts(5), 50.0),
        ],
        "sym string, ts timestamp, price double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts(0), "t0"),    # exactly at a quote → inclusive match
            ("A", _ts(15), "t1"),   # between quotes → 10:00 quote
            ("A", _ts(25), "t2"),   # after last → 20:00 quote
            ("B", _ts(1), "t3"),    # before any quote → NULL
            ("C", _ts(9), "t4"),    # key never quoted → NULL
        ],
        "sym string, ts timestamp, trade_id string",
    )
    out = {
        r["trade_id"]: r["asof_price"]
        for r in asof_join(
            trades, prices, key="sym", ts_col="ts", right_cols=("price",)
        ).collect()
    }
    assert out == {"t0": 100.0, "t1": 110.0, "t2": 120.0, "t3": None, "t4": None}


def test_asof_join_tie_break_largest(spark):
    """Two right rows at the same (key, ts): the larger tie column wins
    (the deterministic analog of last-wins)."""
    right = spark.createDataFrame(
        [("A", _ts(0), 1, "first"), ("A", _ts(0), 2, "second")],
        "k string, ts timestamp, ver int, val string",
    )
    left = spark.createDataFrame(
        [("A", _ts(1), "x")], "k string, ts timestamp, pid string"
    )
    row = asof_join(
        left, right, key="k", ts_col="ts", right_cols=("val",), tie_col="ver"
    ).first()
    assert row["asof_val"] == "second"


def test_range_join_binned_matches_naive(spark):
    """The binned formulation returns exactly the naive inequality
    join's pairs, including intervals spanning multiple bins."""
    events = spark.createDataFrame(
        [(f"u{i % 3}", _ts(i), i) for i in range(40)],
        "user string, ts timestamp, eid int",
    )
    intervals = spark.createDataFrame(
        [
            ("u0", _ts(2), _ts(9), "w0"),     # multi-bin at bin=300s
            ("u1", _ts(20, 30), _ts(21), "w1"),
            ("u2", _ts(50), _ts(59), "w2"),   # beyond data → only ≤39
        ],
        "user string, start timestamp, end timestamp, wid string",
    )
    got = sorted(
        (r["eid"], r["wid"])
        for r in range_join_binned(
            events, intervals, key="user", ts_col="ts",
            start_col="start", end_col="end", bin_secs=300,
        ).collect()
    )
    naive = sorted(
        (r["eid"], r["wid"])
        for r in events.join(
            intervals,
            (events.user == intervals.user)
            & (events.ts >= intervals.start)
            & (events.ts <= intervals.end),
        ).collect()
    )
    assert got == naive and got  # non-empty and identical


def test_range_join_binned_timestamp_ntz(spark, sf_dir):
    """Regression: the real ``events`` scan yields TIMESTAMP_NTZ, and
    Spark 4 rejects ``unix_micros`` on NTZ — the operator must bin
    NTZ-safely. Built from the actual testdata scan (shared sf_dir
    fixture, like the neighboring plan tests), then checked against the
    naive inequality join."""
    import os

    from automotive_translation_pipeline_spark.sources.readers import load_testdata

    if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
        pytest.skip(f"testdata not found at {sf_dir}")
    ev = load_testdata(spark, sf_dir)["events"]
    assert dict(ev.dtypes)["ts"] in ("timestamp_ntz", "timestamp")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end"),
        F.col("event_id").alias("error_id"),
    )
    got = sorted(
        (r["click_id"], r["error_id"])
        for r in range_join_binned(
            clicks, errors, key="user_id", ts_col="ts",
            start_col="start", end_col="end", bin_secs=3600,
        ).collect()
    )
    naive = sorted(
        (r["click_id"], r["error_id"])
        for r in clicks.alias("c")
        .join(
            errors.alias("e"),
            (F.col("c.user_id") == F.col("e.user_id"))
            & (F.col("c.ts") >= F.col("e.start"))
            & (F.col("c.ts") <= F.col("e.end")),
        )
        .collect()
    )
    assert got == naive and got


def test_cogroup_reconcile_missing_and_extra(spark):
    from automotive_translation_pipeline_spark.operators.joins import (
        cogroup_reconcile,
    )

    expected = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], ["key", "bucket"]
    )
    actual = spark.createDataFrame(
        [(1, 0), (9, 0), (3, 1), (4, 1)], ["key", "bucket"]
    )
    got = {
        r["bucket"]: r.asDict()
        for r in cogroup_reconcile(expected, actual, "bucket", "key").collect()
    }
    assert got[0]["n_missing"] == 1 and got[0]["n_extra"] == 1
    assert got[1]["n_missing"] == 0 and got[1]["n_extra"] == 0
    assert got[1]["n_expected"] == 2 and got[1]["n_actual"] == 2


def test_detect_extras_finds_planted_extras(spark):
    """R-15 end-to-end on the response path: the extras-injecting mock
    plants one unrequested id per bucket-0 batch; detect_extras must
    surface EXACTLY the planted set after the full materialize →
    translate → parse round trip (no false extras, none lost to the
    format-varying render, incl. the truncated-json tail cut)."""
    from automotive_translation_pipeline_spark.operators.joins import (
        detect_extras,
    )
    from automotive_translation_pipeline_spark.operators.packing import (
        assign_batches_cumsum,
        materialize_requests,
        with_cost,
    )
    from automotive_translation_pipeline_spark.plans.pipeline import (
        _parse_responses,
    )
    from automotive_translation_pipeline_spark.translate import (
        _extras_bucket_py,
        extra_id,
        mock_translate_extras_udf,
        mock_translation,
        translate_requests,
    )

    docs = spark.createDataFrame(
        [(i, f"sentence number {i} with some words", "en" if i % 2 else "de")
         for i in range(1, 61)],
        "seq long, english_sentence string, shard string",
    ).withColumn("description_id", F.col("seq").cast("string"))
    assigned = assign_batches_cumsum(
        with_cost(docs, "english_sentence"),
        order_col="seq", limit=120, shard_col="shard",
    )
    responses = translate_requests(
        materialize_requests(assigned), translator_udf=mock_translate_extras_udf
    )
    parsed = _parse_responses(responses)
    expected = assigned.select("batch_id", "description_id")
    got = {
        (r["batch_id"], r["description_id"], r["translation"])
        for r in detect_extras(parsed, expected).collect()
    }
    batches = [r["batch_id"] for r in assigned.select("batch_id").distinct().collect()]
    planted = {
        (b, extra_id(b), mock_translation(f"extra {b}"))
        for b in batches if _extras_bucket_py(b) == 0
    }
    assert planted, "test corpus produced no bucket-0 batch — grow it"
    assert got == planted
    # and the plain mock plants nothing: detect_extras returns empty
    clean = _parse_responses(translate_requests(materialize_requests(assigned)))
    assert detect_extras(clean, expected).count() == 0
