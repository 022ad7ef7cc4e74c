"""The parse cascade (SURVEY §2.9: F-7, F-8) as native column expressions.

The reference tries four cleanup strategies, takes the first whose output
``json.loads``-parses to a non-empty dict, and otherwise falls back to
line-by-line regex parsing (``split_translations_by_id``,
``auto_translate.py:490-534``; ``_fallback_line_parsing``,
``auto_translate.py:537-646``).

Here the whole cascade is ``coalesce(from_json(...), ...)`` — Catalyst
evaluates lazily left-to-right, so the cheap strategy short-circuits
exactly like the reference's early-exit loop, but JVM-side and codegen'd.
The line fallback is higher-order array functions over ``split(content)``.

Duplicate ids within one payload collapse **last-wins** (reference dict
overwrite, SURVEY R-25) — requires
``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (set by our session factory and
``load_testdata``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .cleaning import (
    clean_md_aggressive,
    clean_md_basic,
    clean_md_multiline,
    clean_unicode_escapes,
    ws_trim,
)
from .predicates import is_suspicious

_MAP = "map<string,string>"

# Fallback line patterns, in reference priority order
# (``auto_translate.py:553-563``).
_P_JSONISH = r'^"?(\d+)"?\s*:\s*"(.+?)"$'  # "21": "translation"
_P_TUPLE = r"^(\d+)\.\s*\('(\d+)',\s*'(.+?)'\)$"  # 277. ('597', 't')
_P_NUMBERED = r"^(?:desc_)?(\d+)\.\s*(.*)$"  # desc_021. t / 21. t
_P_GENERIC = r"^([^.]+)\.\s*(.*)$"  # key. value


def _nonempty_map(m: Column) -> Column:
    """A parsed map counts only if non-empty (reference requires a
    non-empty dict before accepting a strategy)."""
    return F.when(F.size(m) > 0, m)


def _keep_clean_values(m: Column) -> Column:
    """Drop empty/suspicious values from an id→translation map
    (reference filters through ``is_suspicious_translation`` before
    accepting entries)."""
    return F.map_filter(
        m,
        lambda _, v: v.isNotNull() & (ws_trim(v) != "") & ~is_suspicious(ws_trim(v)),
    )


def json_cascade(c: Column) -> Column:
    """F-7: first-success JSON parse across the four cleanup strategies.

    NULL when every strategy fails — caller decides on the fallback.
    """
    return F.coalesce(
        _nonempty_map(F.from_json(clean_md_basic(c), _MAP)),
        _nonempty_map(F.from_json(clean_md_aggressive(c), _MAP)),
        _nonempty_map(F.from_json(clean_md_multiline(c), _MAP)),
        _nonempty_map(F.from_json(clean_unicode_escapes(c), _MAP)),
    )


def _strip_quotes(c: Column) -> Column:
    return F.regexp_replace(F.regexp_replace(ws_trim(c), "^[\"']+", ""), "[\"']+$", "")


def fallback_line_parse(c: Column) -> Column:
    """F-8: per-line regex cascade → id→translation map.

    Reference ``_fallback_line_parsing`` (``auto_translate.py:592-646``):
    skip fence/html/bare-keyword lines; first matching pattern of four
    wins; strip ``desc_`` prefix and surrounding quotes; drop suspicious.
    """
    lines = F.transform(F.split(F.coalesce(c, F.lit("")), "\n"), ws_trim)
    candidate = F.filter(
        lines,
        lambda l: (l != "")
        & ~l.startswith("```")
        & ~l.startswith("<")
        & ~l.isin("plaintext", "json", "text"),
    )
    entries = F.transform(
        candidate,
        lambda l: F.when(
            l.rlike(_P_JSONISH),
            F.struct(
                F.regexp_extract(l, _P_JSONISH, 1).alias("key"),
                F.regexp_extract(l, _P_JSONISH, 2).alias("value"),
            ),
        )
        .when(
            l.rlike(_P_TUPLE),
            F.struct(
                F.regexp_extract(l, _P_TUPLE, 2).alias("key"),
                F.regexp_extract(l, _P_TUPLE, 3).alias("value"),
            ),
        )
        .when(
            l.rlike(_P_NUMBERED),
            F.struct(
                F.regexp_extract(l, _P_NUMBERED, 1).alias("key"),
                F.regexp_extract(l, _P_NUMBERED, 2).alias("value"),
            ),
        )
        .when(
            l.rlike(_P_GENERIC),
            F.struct(
                F.regexp_replace(F.regexp_extract(l, _P_GENERIC, 1), "^desc_", "").alias(
                    "key"
                ),
                F.regexp_extract(l, _P_GENERIC, 2).alias("value"),
            ),
        ),
    )
    cleaned = F.transform(
        F.filter(entries, lambda e: e.isNotNull()),
        lambda e: F.struct(
            e["key"].alias("key"), _strip_quotes(e["value"]).alias("value")
        ),
    )
    kept = F.filter(
        cleaned,
        lambda e: (e["value"] != "") & ~is_suspicious(e["value"]),
    )
    return F.map_from_entries(kept)


def parse_translations(c: Column) -> Column:
    """F-7 → F-8 composition: the engine's ``parse_translations`` operator.

    Returns ``map<string,string>`` (empty map for null/blank input, like
    the reference's ``{}``), with suspicious values dropped.
    """
    return F.when(
        c.isNull() | (ws_trim(c) == ""), F.expr("map()").cast(_MAP)
    ).otherwise(
        F.coalesce(_keep_clean_values(json_cascade(c)), fallback_line_parse(c))
    )


def parse_strategy(c: Column) -> Column:
    """Which strategy produced the result — diagnostic twin of
    ``parse_translations`` (feeds the R-21 analysis rollup)."""
    return (
        F.when(c.isNull() | (ws_trim(c) == ""), F.lit("empty"))
        .when(F.size(_nonempty_map(F.from_json(clean_md_basic(c), _MAP))) > 0, F.lit("json_basic"))
        .when(
            F.size(_nonempty_map(F.from_json(clean_md_aggressive(c), _MAP))) > 0,
            F.lit("json_aggressive"),
        )
        .when(
            F.size(_nonempty_map(F.from_json(clean_md_multiline(c), _MAP))) > 0,
            F.lit("json_multiline"),
        )
        .when(
            F.size(_nonempty_map(F.from_json(clean_unicode_escapes(c), _MAP))) > 0,
            F.lit("json_unicode"),
        )
        .when(F.size(fallback_line_parse(c)) > 0, F.lit("line_fallback"))
        .otherwise(F.lit("unparseable"))
    )
