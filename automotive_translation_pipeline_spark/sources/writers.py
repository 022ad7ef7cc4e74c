"""Sink operators (SURVEY §2.1: R-6, R-6b).

The reference writes a single CSV with a UTF-8 BOM and one JSONL request
file per run. In Spark both are distributed writes; the BOM is a
presentation detail of the single-file boundary, applied only when a
caller explicitly asks for a merged single file.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_output_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """R-6: final 3-col output CSV.

    Reference: ``auto_translate.py:938-999`` (utf-8-sig, sentinel
    in-band). Internally failures are NULL; the sentinel is materialized
    here, at the sink — keeping NULL semantics inside the engine.
    """
    out = df.withColumn(
        "translated_sentence",
        F.coalesce(F.col("translated_sentence"), F.lit("[TRANSLATION_FAILED]")),
    )
    if not single_file:
        out.write.mode("overwrite").option("header", True).csv(path)
        return
    tmp = path + "._spark_tmp"
    out.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    with open(part, "rb") as src, open(path, "wb") as dst:
        dst.write(b"\xef\xbb\xbf")  # utf-8-sig BOM, matching the reference sink
        shutil.copyfileobj(src, dst)
    shutil.rmtree(tmp)


def write_request_jsonl(df: DataFrame, path: str) -> None:
    """R-6b: request JSONL sink — one JSON object per line.

    Reference: ``auto_translate.py:303-332``. Input df must already have
    the BATCH_REQUEST shape (custom_id/method/url/body).
    """
    df.select(F.to_json(F.struct("custom_id", "method", "url", "body"))).write.mode(
        "overwrite"
    ).text(path)
