"""Explicit schemas for every table the engine touches.

The reference fixes schemas by convention (positional CSV columns, nested
JSON shapes); we declare them so scans never rely on inference — at 100 TB
schema inference is both a correctness and a performance bug.

Reference shapes: descriptions CSV loader ``auto_translate.py:267-275``,
request JSONL ``auto_translate.py:310-331``, response JSONL
``auto_translate.py:392-407``, ledger ``auto_translate.py:114-132``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- §1.1 primary input: descriptions -------------------------------------
# description_id stays a string: ids look like "P0001" or "21" and must
# round-trip byte-identically through the LLM payload.
DESCRIPTIONS = T.StructType(
    [
        T.StructField("description_id", T.StringType(), False),
        T.StructField("english_sentence", T.StringType(), True),
    ]
)

# --- §1.2 packed batch requests (the JSONL boundary shape) ----------------
REQUEST_BODY = T.StructType(
    [
        T.StructField("model", T.StringType(), False),
        T.StructField(
            "messages",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("role", T.StringType(), False),
                        T.StructField("content", T.StringType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField("temperature", T.DoubleType(), False),
        T.StructField("max_tokens", T.IntegerType(), False),
    ]
)

BATCH_REQUEST = T.StructType(
    [
        T.StructField("custom_id", T.StringType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("body", REQUEST_BODY, False),
    ]
)

# --- §1.3 batch responses (permissive; malformed rows surface as nulls) ---
BATCH_RESPONSE = T.StructType(
    [
        T.StructField("custom_id", T.StringType(), True),
        T.StructField(
            "response",
            T.StructType(
                [
                    T.StructField("status_code", T.IntegerType(), True),
                    T.StructField(
                        "body",
                        T.StructType(
                            [
                                T.StructField(
                                    "choices",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "message",
                                                    T.StructType(
                                                        [
                                                            T.StructField(
                                                                "content",
                                                                T.StringType(),
                                                                True,
                                                            )
                                                        ]
                                                    ),
                                                    True,
                                                )
                                            ]
                                        )
                                    ),
                                    True,
                                )
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        ),
        T.StructField("error", T.StringType(), True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)

# --- §1.5 output table ----------------------------------------------------
TRANSLATIONS_OUT = T.StructType(
    [
        T.StructField("description_id", T.StringType(), False),
        T.StructField("english_sentence", T.StringType(), True),
        T.StructField("translated_sentence", T.StringType(), True),
    ]
)

# --- §1.6 batch-tracking ledger -------------------------------------------
LEDGER = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), False),
        T.StructField("input_file", T.StringType(), True),
        T.StructField("job_id", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("target_language", T.StringType(), True),
        T.StructField("output_file", T.StringType(), True),
    ]
)

# Ledger status state machine (BATCH_TRACKING_GUIDE.md:169-182).
LEDGER_STATUSES = (
    "submitted",
    "validating",
    "in_progress",
    "finalizing",
    "completed",
    "failed",
    "download_failed",
)

# --- testdata tables (TESTDATA.md) ----------------------------------------
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
