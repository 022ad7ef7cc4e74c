"""Scan operators (SURVEY §2.1: R-1..R-5).

Every reader takes an explicit schema and pushes filters/projections into
the scan — at 100 TB the difference between "scan 2 columns with a pushed
predicate" and "scan everything then filter" is the whole job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import BATCH_RESPONSE, DESCRIPTIONS, TESTDATA_TABLES


def read_descriptions_csv(spark: SparkSession, path: str) -> DataFrame:
    """R-1: descriptions CSV scan with header and fixed 2-col schema.

    Reference: ``auto_translate.py:267-275`` (csv.reader, skip header).
    Explicit schema keeps ``P0001``-style ids as strings; no inference.
    """
    return spark.read.schema(DESCRIPTIONS).option("header", True).csv(path)


def read_descriptions_dir(spark: SparkSession, directory: str) -> DataFrame:
    """R-5: directory scan — all ``*.csv`` in a folder, with file lineage.

    Reference: ``batch_auto_translate.py:199-202`` enumerates files and
    fans out a subprocess per file; in Spark the fan-out disappears into
    tasks and per-file grouping comes back via ``input_file_name()``.
    """
    return (
        spark.read.schema(DESCRIPTIONS)
        .option("header", True)
        .csv(f"{directory}/*.csv")
        .withColumn("source_file", F.input_file_name())
    )


def read_request_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """R-3: request JSONL scan → (custom_id, payload map) rows.

    Reference: ``old_functionalities/batch_translator.py:44-68`` re-reads
    the request file and regexes the user content to recover the
    batch→ids mapping. Here the user message is parsed back into a
    ``map<string,string>`` with ``from_json`` — no regex needed for the
    v2 JSON-map format.
    """
    raw = spark.read.json(path)
    user_content = F.element_at(F.col("body.messages"), -1).getField("content")
    return raw.select(
        F.col("custom_id"),
        F.from_json(user_content, "map<string,string>").alias("payload"),
    )


def read_response_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """R-4: response JSONL scan → (custom_id, status_code, content, error).

    Reference: ``parse_output_jsonl`` (``auto_translate.py:392-407``) —
    extracts ``response.body.choices[0].message.content`` with a
    catch-all → None. Malformed lines land in ``_corrupt_record``
    instead of killing the scan (permissive mode).
    """
    raw = (
        spark.read.schema(BATCH_RESPONSE)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return raw.select(
        "custom_id",
        F.col("response.status_code").alias("status_code"),
        F.element_at(F.col("response.body.choices"), 1)
        .getField("message")
        .getField("content")
        .alias("content"),
        "error",
        "_corrupt_record",
    )


# Columns written as parquet TIMESTAMP(NANOS, adjustedToUTC=false), which
# Spark 4.1 rejects (PARQUET_TYPE_ILLEGAL) unless the nanosAsLong escape
# hatch maps them to bigint; rebuilt to timestamps below. Only `events.ts`
# is NANOS — lineitem/orders timestamps are TIMESTAMP(MILLIS) and read
# natively as timestamp_ntz (so range predicates on them push to the scan
# with no special handling).
_NANO_TS_COLS = {
    "events": ("ts",),
}


def ts_nanos(literal: str) -> int:
    """Epoch nanoseconds of a naive-UTC timestamp literal
    (``YYYY-MM-DD`` or ``YYYY-MM-DD HH:MM:SS[.ffffff]``)."""
    import calendar
    from datetime import datetime

    dt = datetime.fromisoformat(literal)
    return calendar.timegm(dt.timetuple()) * 1_000_000_000 + dt.microsecond * 1_000


_RANGE_OPS = {
    ">=": lambda c, v: c >= v,
    ">": lambda c, v: c > v,
    "<=": lambda c, v: c <= v,
    "<": lambda c, v: c < v,
}


def scan_ts_pruned(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    preds: list[tuple[str, str, str]],
) -> DataFrame:
    """Parquet scan with timestamp range predicates applied directly on
    the scan columns — in the raw INT64-nanos domain where needed.

    Two cases, one interface:

    - TIMESTAMP(NANOS) columns (``events.ts``) arrive as ``bigint``
      (``nanosAsLong``) and ``load_testdata`` rebuilds them with a
      projection Catalyst cannot invert — a filter on the rebuilt
      column stays ABOVE the scan and every row group is read.
      nanos→timestamp is strictly monotonic, hence
      ``ts OP literal ⇔ raw OP epoch_nanos(literal)`` exactly: pushing
      the raw-domain twin reaches the parquet reader as
      ``PushedFilters`` and prunes row groups / pages via min-max
      statistics. At 100 TB with time-sorted or time-partitioned files
      this is the difference between scanning the requested day and
      scanning the month.
    - TIMESTAMP(MILLIS) columns (``l_shipdate``, ``o_orderdate``) read
      natively as ``timestamp_ntz``; the predicate applies as-is and
      pushes on its own. The helper just guarantees it sits on the
      scan column before any projection/join.

    ``preds``: list of ``(column, op, timestamp_literal)`` with op in
    ``>= > <= <``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    dtypes = dict(df.dtypes)
    for col, op, literal in preds:
        if op not in _RANGE_OPS:
            raise ValueError(f"unsupported op {op!r}")
        if dtypes.get(col) == "bigint":
            df = df.filter(_RANGE_OPS[op](F.col(col), F.lit(ts_nanos(literal))))
        else:
            df = df.filter(
                _RANGE_OPS[op](F.col(col), F.lit(literal).cast("timestamp"))
            )
    for col in _NANO_TS_COLS.get(table, ()):
        if dtypes.get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver's parquet tables and register them as temp views."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Engine contract (safe to set on any session the driver hands us):
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        # Tables absent from a partial scale-factor directory are
        # skipped, not errors: a query touches only the tables it
        # reads, and large-SF corpora are generated per table family
        # (e.g. documents+embeddings only for the text/dedup sweeps).
        # Accessing a skipped table raises KeyError at the call site.
        if not os.path.exists(f"{sf_dir}/{name}.parquet"):
            continue
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for c in _NANO_TS_COLS.get(name, ()):
            if dict(df.dtypes).get(c) == "bigint":
                # Integer division — float division loses 1µs at ~1.7e18
                # nanos, silently shifting timestamps off the oracle's.
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
