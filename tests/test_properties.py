"""Property-based tests: the parse/repair stack must never crash and
must round-trip whatever the mock formats encode.

Hypothesis drives the pure-Python repair kernel directly (fast); the
Spark cascade is exercised over one composite DataFrame of generated
payloads (one collect, not one per example).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from automotive_translation_pipeline_spark.functions.parsing import (
    parse_translations,
)
from automotive_translation_pipeline_spark.functions.repair import (
    repair_content,
)
from automotive_translation_pipeline_spark.translate import (
    mock_translation,
    render_mock_content,
)

# Translations that survive the suspicious filter: ≥3 chars, not pure
# digits, no leading fence/brace chars, not in the blocklist.
_clean_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Lo"), min_codepoint=0x41
    ),
    min_size=4,
    max_size=40,
).filter(lambda s: s.strip() == s and len(s.strip()) >= 4)

_ids = st.integers(min_value=0, max_value=99999).map(str)
_payloads = st.dictionaries(_ids, _clean_text, min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(blob=st.text(max_size=400))
def test_repair_never_crashes_and_output_parses(blob):
    out = repair_content(blob)
    if out is not None:
        inner = out
        if inner.startswith("```json"):
            inner = inner.removeprefix("```json\n").removesuffix("\n```")
        json.loads(inner)  # repair output is ALWAYS valid JSON


@settings(max_examples=100, deadline=None)
@given(payload=_payloads)
def test_truncated_render_repairs_to_prefix(payload):
    """The mock's truncated format loses at most the last entry; repair
    must recover every other entry verbatim."""
    body = json.dumps(
        {k: mock_translation(v) for k, v in payload.items()},
        ensure_ascii=False,
        indent=2,
    )
    cut = body.rfind('",')
    truncated = f"```json\n{body[: cut + 2] if cut > 0 else body}"
    out = repair_content(truncated)
    assert out is not None
    inner = out.removeprefix("```json\n").removesuffix("\n```")
    recovered = json.loads(inner)
    expected = {k: mock_translation(v) for k, v in payload.items()}
    # Recovered is a prefix of expected missing at most one entry.
    assert set(recovered) <= set(expected)
    assert len(recovered) >= len(expected) - 1
    for k, v in recovered.items():
        assert expected[k] == v


def test_spark_cascade_roundtrips_generated_payloads(spark):
    """All four mock formats round-trip through the native cascade for
    a batch of generated payloads in one DataFrame pass."""
    import random

    rnd = random.Random(42)
    words = ["engine", "brake", "sensor", "coolant", "మోటారు", "తనిఖీ", "valve"]
    rows = []
    expect = {}
    for i in range(120):
        payload = {
            str(rnd.randrange(10**5)): " ".join(
                rnd.choices(words, k=rnd.randrange(2, 6))
            )
            for _ in range(rnd.randrange(1, 7))
        }
        cid = f"batch-{i:04d}"
        rows.append((cid, render_mock_content(payload, cid)))
        translated = {k: mock_translation(v) for k, v in payload.items()}
        fmt = sum(cid.encode()) % 4
        if fmt == 2 and len(translated) >= 2:
            # truncated: drop the last entry in insertion order
            *keep, _last = translated
            translated = {k: translated[k] for k in keep}
            expect[cid] = ("truncated", translated)
        else:
            expect[cid] = ("full", translated)
    df = spark.createDataFrame(rows, "custom_id string, content string")
    from automotive_translation_pipeline_spark.functions.predicates import (
        is_truncated,
    )
    from automotive_translation_pipeline_spark.functions.repair import (
        repair_json_udf,
    )

    repaired = df.select(
        "custom_id",
        F.when(
            is_truncated(F.col("content")),
            F.coalesce(repair_json_udf(F.col("content")), F.col("content")),
        )
        .otherwise(F.col("content"))
        .alias("c"),
    )
    got = {
        r["custom_id"]: r["m"]
        for r in repaired.select(
            "custom_id", parse_translations(F.col("c")).alias("m")
        ).collect()
    }
    for cid, (kind, translated) in expect.items():
        # Values that look suspicious (short) are dropped by design;
        # compare only the clean subset.
        clean = {
            k: v
            for k, v in translated.items()
            if len(v.strip()) >= 3 and not v.strip().isdigit()
        }
        assert got[cid] == clean, f"{cid} ({kind}): {got[cid]} != {clean}"
