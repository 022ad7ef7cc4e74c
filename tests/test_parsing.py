"""Parse-cascade tests over the reference's three response format
families (testing/test_parsing.py:104-136) plus the cleanup strategies.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from automotive_translation_pipeline_spark.functions.parsing import (
    parse_strategy,
    parse_translations,
)

# The three reference formats (testing/test_parsing.py) with Telugu-like
# payloads, plus edge cases.
PERFECT_JSON = '{"21": "కూలెంట్ స్థాయి తనిఖీ చేయండి", "27": "బ్రేక్ ప్యాడ్లు"}'
FENCED_JSON = '```json\n{"21": "కూలెంట్ తనిఖీ", "27": "బ్రేక్ తనిఖీ"}\n```'
LEGACY_LINES = "desc_21. కూలెంట్ స్థాయి తనిఖీ\ndesc_27. బ్రేక్ ప్యాడ్లు తనిఖీ"
NUMBERED_LINES = "21. కూలెంట్ స్థాయి తనిఖీ\n27. బ్రేక్ ప్యాడ్లు తనిఖీ"
TUPLE_LINES = "320. ('640', 'ఇంజిన్ ఆయిల్ తనిఖీ')\n321. ('641', 'టైర్ ఒత్తిడి')"


def _parse(spark, blob):
    df = spark.createDataFrame([(blob,)], "content string")
    return df.select(parse_translations(F.col("content")).alias("m")).first()["m"]


def _strategy(spark, blob):
    df = spark.createDataFrame([(blob,)], "content string")
    return df.select(parse_strategy(F.col("content")).alias("s")).first()["s"]


def test_perfect_json(spark):
    m = _parse(spark, PERFECT_JSON)
    assert m == {
        "21": "కూలెంట్ స్థాయి తనిఖీ చేయండి",
        "27": "బ్రేక్ ప్యాడ్లు",
    }
    assert _strategy(spark, PERFECT_JSON) == "json_basic"


def test_fenced_json(spark):
    m = _parse(spark, FENCED_JSON)
    assert m == {"21": "కూలెంట్ తనిఖీ", "27": "బ్రేక్ తనిఖీ"}


def test_legacy_desc_lines(spark):
    m = _parse(spark, LEGACY_LINES)
    assert m == {
        "21": "కూలెంట్ స్థాయి తనిఖీ",
        "27": "బ్రేక్ ప్యాడ్లు తనిఖీ",
    }
    assert _strategy(spark, LEGACY_LINES) == "line_fallback"


def test_numbered_lines(spark):
    m = _parse(spark, NUMBERED_LINES)
    assert set(m.keys()) == {"21", "27"}


def test_tuple_lines(spark):
    m = _parse(spark, TUPLE_LINES)
    # Tuple format: the id INSIDE the tuple wins (reference pattern 2).
    assert m == {"640": "ఇంజిన్ ఆయిల్ తనిఖీ", "641": "టైర్ ఒత్తిడి"}


def test_empty_and_null(spark):
    assert _parse(spark, "") == {}
    assert _parse(spark, None) == {}
    assert _strategy(spark, "") == "empty"


def test_suspicious_values_dropped(spark):
    blob = '{"1": "నిజమైన అనువాదం ఇక్కడ", "2": "null", "3": "12", "4": "ab"}'
    m = _parse(spark, blob)
    assert m == {"1": "నిజమైన అనువాదం ఇక్కడ"}


def test_duplicate_ids_last_wins(spark):
    # R-25: dict-overwrite contract.
    blob = '21. మొదటి\n21. చివరి అనువాదం'
    m = _parse(spark, blob)
    assert m == {"21": "చివరి అనువాదం"}


def test_fence_skip_lines(spark):
    blob = "```\n21. అనువాదం ఒకటి\n```"
    # Lines inside fences are skipped by the line parser, but the
    # multiline cleaner extracts them first via the JSON path — this is
    # not JSON, so the fallback runs on raw lines, skipping fences.
    m = _parse(spark, blob)
    assert m == {"21": "అనువాదం ఒకటి"}


def test_udtf_parity_with_native_cascade(spark):
    """The Python UDTF and the native expression cascade agree on every
    reference response family (the UDTF is the extensibility seam; the
    cascade is the hot path — they must not drift)."""
    from automotive_translation_pipeline_spark.functions.parse_udtf import (
        register_parse_udtf,
    )

    register_parse_udtf(spark)
    blobs = [PERFECT_JSON, FENCED_JSON, LEGACY_LINES, NUMBERED_LINES, TUPLE_LINES]
    df = spark.createDataFrame([(i, b) for i, b in enumerate(blobs)], "i int, content string")
    df.createOrReplaceTempView("blobs")
    native = {
        (r["i"], r["description_id"]): r["translation"]
        for r in df.select(
            "i", F.explode(parse_translations(F.col("content")))
        ).toDF("i", "description_id", "translation").collect()
    }
    via_udtf = {
        (r["i"], r["description_id"]): r["translation"]
        for r in spark.sql(
            "SELECT b.i, p.description_id, p.translation "
            "FROM blobs b, LATERAL parse_translations_udtf(b.content) p"
        ).collect()
    }
    assert via_udtf == native and len(native) == 10


def test_udtf_empty_and_garbage_yield_no_rows(spark):
    from automotive_translation_pipeline_spark.functions.parse_udtf import (
        parse_content,
    )

    assert parse_content(None) == []
    assert parse_content("   ") == []
    assert parse_content("{broken json") == []
    # suspicious-only payload: values all blocklisted/short
    assert parse_content('{"1": "ok", "2": "null"}') == []
