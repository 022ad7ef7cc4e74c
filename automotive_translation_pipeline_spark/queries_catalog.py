"""Query catalog: the SURVEY §2 operator inventory as (Spark query,
DuckDB oracle SQL) pairs for the driver's correctness harness.

Conventions (driver contract):
- every callable takes (spark, sf_dir) and returns a DataFrame;
- every computed column is aliased IDENTICALLY in Spark and SQL;
- doubles are rounded in-query on BOTH sides so value hashes match;
- ordering never matters (driver compares order-insensitively), but
  ties in top-k queries are broken deterministically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.predicates import is_suspicious
from .functions.text import (
    bpe_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    script_of,
    token_count,
)
from .functions.timeutil import format_unix_ts
from .operators.aggregates import error_rollup, group_counts
from .operators.dedup import anti_join_dedup, exact_dedup
from .operators.packing import assign_batches_cumsum, with_cost
from .operators.windows import last_wins, sequence_check, shift_flags, topk_recent
from .sources import load_testdata

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]

_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec[0] for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec[1] for name, spec in _REGISTRY.items() if spec[1] is not None}


# --- portable expression fragments (Spark + DuckDB twins) ------------------

# BPE-ish token count (functions/text.py:bpe_token_count) in DuckDB SQL.
_DUCK_BPE = (
    "list_sum(list_transform(regexp_split_to_array(trim({c}), '\\s+'), "
    "w -> greatest(1, cast(ceil(length(w) / 4.0) as bigint))))"
)


# =========================================================================
# §2.2 projections / filters
# =========================================================================


@register(
    "r7_nonempty_filter",
    """
    SELECT doc_id, trim(text) AS sentence, lang
    FROM documents
    WHERE length(trim(text)) > 0
    """,
)
def r7_nonempty_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-7: non-empty filter + trim projection (auto_translate.py:271-275)."""
    t = load_testdata(spark, sf_dir)
    return (
        t["documents"]
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.trim("text").alias("sentence"), "lang")
    )


@register(
    "r8_status_filter",
    """
    SELECT event_id, user_id, event_type, round(value, 2) AS value_r
    FROM events WHERE event_type = 'error'
    """,
)
def r8_status_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-8: equality filter on a status column (auto_translate.py:221-235)."""
    t = load_testdata(spark, sf_dir)
    return t["events"].filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value_r")
    )


@register(
    "r9_point_lookup",
    "SELECT event_id, user_id, event_type FROM events WHERE event_id = 42",
)
def r9_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-9: point lookup by unique key (auto_translate.py:208-218)."""
    t = load_testdata(spark, sf_dir)
    return t["events"].filter(F.col("event_id") == 42).select(
        "event_id", "user_id", "event_type"
    )


@register(
    "r10_suspicious_predicate",
    """
    SELECT doc_id,
           (t IS NULL
            OR lower(trim(t)) IN ('[translation_failed]','plaintext','text','code',
                'output','none','null','undefined','error','failed','missing',
                'empty','json','translation','response','content','message',
                'system','user')
            OR trim(t) LIKE '``%'
            OR trim(t) LIKE '<%'
            OR trim(t) LIKE '{%'
            OR trim(t) LIKE '[%'
            OR length(trim(t)) < 3
            OR regexp_full_match(trim(t), '\\d+')) AS suspicious
    FROM (SELECT doc_id, reverse(trim(text)) AS t FROM documents)
    """,
)
def r10_suspicious_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-10: the 18-token suspicious predicate over mock translations
    (auto_translate.py:649-672)."""
    t = load_testdata(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        is_suspicious(F.reverse(F.trim("text"))).alias("suspicious"),
    )


# =========================================================================
# §2.3 joins
# =========================================================================


@register(
    "r12_anti_join_dedup",
    """
    SELECT d.doc_id, d.lang
    FROM documents d
    WHERE NOT EXISTS (
        SELECT 1 FROM documents done
        WHERE done.doc_id % 7 = 0 AND done.doc_id = d.doc_id)
      AND length(trim(d.text)) > 0
    """,
)
def r12_anti_join_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-12: anti-join dedup against the already-done table
    (preprocessing/duplicate_remove.py:11-21)."""
    t = load_testdata(spark, sf_dir)
    docs = t["documents"].filter(F.length(F.trim("text")) > 0)
    done = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    return anti_join_dedup(docs, done, key="doc_id").select("doc_id", "lang")


@register(
    "r13_left_join_sentinel",
    """
    SELECT e.event_id, e.user_id,
           coalesce(c.c_name, '[TRANSLATION_FAILED]') AS resolved_name
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def r13_left_join_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-13: left-outer equi-join with in-band sentinel for misses
    (auto_translate.py:971-999). Dimension side broadcasts."""
    t = load_testdata(spark, sf_dir)
    cust = F.broadcast(t["customer"].select("c_custkey", "c_name"))
    return (
        t["events"]
        .join(cust, t["events"].user_id == cust.c_custkey, "left_outer")
        .select(
            "event_id",
            "user_id",
            F.coalesce("c_name", F.lit("[TRANSLATION_FAILED]")).alias("resolved_name"),
        )
    )


@register(
    "r14_first_match_lookup",
    """
    SELECT o.o_orderkey, coalesce(fl.first_partkey, -1) AS first_partkey
    FROM orders o
    LEFT JOIN (
        SELECT l_orderkey, min(l_partkey) AS first_partkey
        FROM (
            SELECT l_orderkey, l_partkey,
                   min(l_linenumber) OVER (PARTITION BY l_orderkey) AS min_ln,
                   l_linenumber
            FROM lineitem)
        WHERE l_linenumber = min_ln
        GROUP BY l_orderkey
    ) fl ON o.o_orderkey = fl.l_orderkey
    """,
)
def r14_first_match_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-14: first-match lookup-join — the reference's O(n) ``next(...)``
    scan (auto_translate.py:971-974) as dedup-then-hash-join.

    (l_orderkey, l_linenumber) is not unique in the testdata, so
    "first" is pinned deterministically: lowest partkey among the rows
    with the lowest line number."""
    t = load_testdata(spark, sf_dir)
    w = Window.partitionBy("l_orderkey")
    first_line = (
        t["lineitem"]
        .withColumn("min_ln", F.min("l_linenumber").over(w))
        .filter(F.col("l_linenumber") == F.col("min_ln"))
        .groupBy("l_orderkey")
        .agg(F.min("l_partkey").alias("first_partkey"))
    )
    return (
        t["orders"]
        .join(first_line, t["orders"].o_orderkey == first_line.l_orderkey, "left_outer")
        .select(
            "o_orderkey",
            F.coalesce("first_partkey", F.lit(-1)).alias("first_partkey"),
        )
    )


@register(
    "r15_extras_anti_join",
    """
    SELECT DISTINCT e.user_id
    FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
    """,
)
def r15_extras_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-15: ids delivered that were never requested — left-anti join
    (auto_translate.py:1006-1009)."""
    t = load_testdata(spark, sf_dir)
    return (
        t["events"]
        .join(t["customer"], t["events"].user_id == t["customer"].c_custkey, "left_anti")
        .select("user_id")
        .distinct()
    )


# =========================================================================
# §2.4 packing (R-17/R-18)
# =========================================================================

_PACK_SQL_BASE = f"""
    WITH todo AS (
        SELECT doc_id, trim(text) AS sentence, lang
        FROM documents
        WHERE length(trim(text)) > 0
    ), costed AS (
        SELECT doc_id, lang,
               {_DUCK_BPE.format(c="sentence")}
               + {_DUCK_BPE.format(c="sentence")} * 1.8 AS cost
        FROM todo
    ), assigned AS (
        SELECT doc_id, lang, cost,
               lang || '-' || cast(cast(floor(
                   (sum(cost) OVER (PARTITION BY lang ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - 1e-9) / 4000
               ) as bigint) as varchar) AS batch_id
        FROM costed
    )
"""


@register(
    "r17_pack_cumsum",
    _PACK_SQL_BASE + "SELECT doc_id, batch_id FROM assigned",
)
def r17_pack_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-17: token-aware batch packing, prefix-sum formulation, sharded
    by language (auto_translate.py:278-301; SURVEY §2.4)."""
    t = load_testdata(spark, sf_dir)
    docs = (
        t["documents"]
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.trim("text").alias("sentence"), F.col("lang").alias("shard"))
    )
    assigned = assign_batches_cumsum(
        with_cost(docs, "sentence"), order_col="doc_id", limit=4000, shard_col="shard"
    )
    return assigned.select("doc_id", "batch_id")


@register(
    "r18_batch_sizes",
    _PACK_SQL_BASE
    + """
    SELECT batch_id, count(*) AS n_rows, round(sum(cost), 2) AS total_cost
    FROM assigned GROUP BY batch_id
    """,
)
def r18_batch_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-18/R-24: per-batch materialization stats (auto_translate.py:303-332)."""
    t = load_testdata(spark, sf_dir)
    docs = (
        t["documents"]
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.trim("text").alias("sentence"), F.col("lang").alias("shard"))
    )
    assigned = assign_batches_cumsum(
        with_cost(docs, "sentence"), order_col="doc_id", limit=4000, shard_col="shard"
    )
    return assigned.groupBy("batch_id").agg(
        F.count("*").alias("n_rows"), F.round(F.sum("cost"), 2).alias("total_cost")
    )


# =========================================================================
# §2.5 aggregations
# =========================================================================


@register(
    "r21_error_rollup",
    """
    SELECT event_type, count(*) AS n,
           round(count(*) * 100.0 / (SELECT count(*) FROM events), 2) AS pct
    FROM events GROUP BY event_type
    """,
)
def r21_error_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-21: per-error-type counts + share (auto_translate.py:1504-1543)."""
    t = load_testdata(spark, sf_dir)
    return error_rollup(t["events"], "event_type")


@register(
    "r22_group_by_status",
    "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus",
)
def r22_group_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-22: ledger-style status counts (batch_tracker.py:110-115)."""
    t = load_testdata(spark, sf_dir)
    return group_counts(t["orders"], "o_orderstatus")


@register(
    "r23_group_by_language",
    "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
)
def r23_group_by_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-23: per-language counts (batch_tracker.py:117-120)."""
    t = load_testdata(spark, sf_dir)
    return group_counts(t["documents"], "lang")


@register(
    "r24_per_group_count",
    "SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey",
)
def r24_per_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-24: per-batch extraction count (auto_translate.py:966)."""
    t = load_testdata(spark, sf_dir)
    return group_counts(t["lineitem"], "l_orderkey")


# =========================================================================
# §2.6 windows
# =========================================================================


@register(
    "r25_last_wins",
    """
    SELECT user_id, event_id, event_type FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
    """,
)
def r25_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-25: duplicate keys collapse last-wins (auto_translate.py:514-518).
    Explicit ordering column — dict insertion order made visible."""
    t = load_testdata(spark, sf_dir)
    ev = t["events"].withColumn(
        "__ord", F.struct(F.col("ts"), F.col("event_id"))
    )
    return last_wins(ev, ["user_id"], "__ord").select(
        "user_id", "event_id", "event_type"
    )


@register(
    "r26_shift_detection",
    """
    SELECT user_id, event_id FROM (
        SELECT user_id, event_id, failed,
               coalesce(lead(failed) OVER w, TRUE) AS next_failed,
               coalesce(lag(failed)  OVER w, TRUE) AS prev_failed,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn_last
        FROM (SELECT user_id, event_id, ts, event_type = 'error' AS failed
              FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE (failed AND NOT next_failed)
       OR (failed AND rn_last = 1 AND NOT prev_failed)
    """,
)
def r26_shift_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-26/R-27: lead/lag shift detection (auto_translate.py:1012-1032),
    keyed by user instead of batch on the events table."""
    t = load_testdata(spark, sf_dir)
    ev = t["events"].select(
        "user_id",
        "event_id",
        F.struct(F.col("ts"), F.col("event_id")).alias("__ord"),
        (F.col("event_type") == "error").alias("is_failed"),
    )
    flagged = shift_flags(ev, batch_col="user_id", order_col="__ord")
    return flagged.filter(F.col("shift_suspect")).select("user_id", "event_id")


@register(
    "r28_topk_recent",
    """
    SELECT event_id, user_id, event_type
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 5
    """,
)
def r28_topk_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-28: most-recent-top-k (batch_tracker.py:132-140) —
    TakeOrderedAndProject, not a global sort."""
    t = load_testdata(spark, sf_dir)
    return topk_recent(t["events"], "ts", k=5, tiebreak="event_id").select(
        "event_id", "user_id", "event_type"
    )


@register(
    "r29_sequence_check",
    """
    SELECT user_id, event_id, claimed_number, expected_number FROM (
        SELECT user_id, event_id,
               event_id % 5 + 1 AS claimed_number,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS expected_number
        FROM events)
    WHERE claimed_number <> expected_number
    """,
)
def r29_sequence_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-29: numbering-sequence violations
    (old_functionalities/check_and_process.py:296-310). Uses events with
    a synthetic claimed line number (event_id is unique → deterministic
    expected order; lineitem's (orderkey, linenumber) is not unique)."""
    t = load_testdata(spark, sf_dir)
    ev = t["events"].select(
        "user_id",
        "event_id",
        (F.col("event_id") % 5 + 1).alias("claimed_number"),
        F.struct(F.col("ts"), F.col("event_id")).alias("__ord"),
    )
    return sequence_check(
        ev, batch_col="user_id", order_col="__ord", number_col="claimed_number"
    ).select("user_id", "event_id", "claimed_number", "expected_number")


# =========================================================================
# §2.9 scalar functions
# =========================================================================


@register(
    "f2_token_count",
    f"""
    SELECT doc_id,
           length(regexp_split_to_array(trim(text), '\\s+')) AS n_ws_tokens,
           {_DUCK_BPE.format(c="text")} AS n_bpe_tokens
    FROM documents
    """,
)
def f2_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-2: whitespace + BPE-ish token counts (tiktoken stand-in,
    auto_translate.py:259-260)."""
    t = load_testdata(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws_tokens"),
        bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


@register(
    "f15_ts_format",
    """
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str FROM events
    """,
)
def f15_ts_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-15: timestamp display formatting (batch_tracker.py:40-46)."""
    t = load_testdata(spark, sf_dir)
    return t["events"].select(
        "event_id",
        format_unix_ts(F.unix_timestamp("ts")).alias("ts_str"),
    )


@register(
    "f18_script_of",
    """
    SELECT script, count(*) AS n FROM (
        SELECT CASE
            WHEN regexp_matches(text, '[\\x{0C00}-\\x{0C7F}]') THEN 'telugu'
            WHEN regexp_matches(text, '[\\x{0900}-\\x{097F}]') THEN 'devanagari'
            WHEN regexp_matches(text, '[\\x{0600}-\\x{06FF}]') THEN 'arabic'
            WHEN regexp_matches(text, '[\\x{4E00}-\\x{9FFF}]') THEN 'cjk'
            WHEN regexp_matches(text, '[\\x{0400}-\\x{04FF}]') THEN 'cyrillic'
            WHEN regexp_matches(text, '[\\x{0370}-\\x{03FF}]') THEN 'greek'
            WHEN regexp_matches(text, '[\\x{AC00}-\\x{D7AF}]') THEN 'hangul'
            WHEN regexp_matches(text, '[A-Za-z]') THEN 'latin'
            ELSE 'unknown' END AS script
        FROM documents)
    GROUP BY script
    """,
)
def f18_script_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-18 generalized: unicode-script classification
    (old_functionalities/testing.py:16-19)."""
    t = load_testdata(spark, sf_dir)
    return (
        t["documents"]
        .select(script_of(F.col("text")).alias("script"))
        .groupBy("script")
        .agg(F.count("*").alias("n"))
    )


@register(
    "f19_strip_numbering",
    """
    SELECT doc_id,
           regexp_replace(cast(doc_id as varchar) || '. ' || trim(text),
                          '^\\d+\\.\\s*', '') AS stripped
    FROM documents
    """,
)
def f19_strip_numbering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-19: strip numbering prefixes (old_functionalities/testing.py:23-24)."""
    t = load_testdata(spark, sf_dir)
    from .functions.cleaning import strip_numbering

    numbered = F.concat(F.col("doc_id").cast("string"), F.lit(". "), F.trim("text"))
    return t["documents"].select(
        "doc_id", strip_numbering(numbered).alias("stripped")
    )
