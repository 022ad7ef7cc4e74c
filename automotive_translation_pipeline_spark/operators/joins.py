"""Join operators (SURVEY §2.3: R-13, R-14, R-15, R-16).

Every join in the reference is a small-dimension equi-join done as a
Python dict lookup or an O(n) linear scan; here they are hash joins that
Catalyst turns into broadcast joins automatically when one side is small.
At 100 TB the expected-ids side is the big fact — it shuffles on
(batch_id, description_id) once and every downstream step reuses that
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAILED_SENTINEL = "[TRANSLATION_FAILED]"


def rejoin_results(
    expected: DataFrame,
    parsed: DataFrame,
    keys: tuple[str, ...] = ("batch_id", "description_id"),
    translation_col: str = "translation",
    materialize_sentinel: bool = False,
) -> DataFrame:
    """R-13 + R-14: left-join parsed translations back onto the expected
    rows; missing → NULL (or the reference's in-band sentinel when
    ``materialize_sentinel``; reference ``auto_translate.py:971-999``).

    R-14's first-match contract (the reference's ``next(...)`` linear
    scan returns the first hit) is preserved by deduplicating the build
    side on the join keys before joining.
    """
    build = parsed.dropDuplicates(list(keys))
    out = expected.join(build, list(keys), "left_outer")
    if materialize_sentinel:
        out = out.withColumn(
            translation_col,
            F.coalesce(F.col(translation_col), F.lit(FAILED_SENTINEL)),
        )
    return out


def detect_extras(
    parsed: DataFrame,
    expected: DataFrame,
    keys: tuple[str, ...] = ("batch_id", "description_id"),
) -> DataFrame:
    """R-15: parsed ids that were never requested in their batch
    (reference ``auto_translate.py:1006-1009``) — a left-anti join."""
    return parsed.join(expected.select(*keys), list(keys), "left_anti")


def pair_by_stem(
    left: DataFrame,
    right: DataFrame,
    left_path: str,
    right_path: str,
) -> DataFrame:
    """R-16: pair files by basename stem (``X.jsonl`` ↔ ``X.csv``,
    reference ``old_functionalities/batch_translator.py:172-180``).
    Unmatched rows drop out of the inner join; use a left_anti on the
    result for the skip report."""
    stem = lambda c: F.regexp_extract(F.col(c), r"([^/]+?)(?:\.[^./]+)?$", 1)  # noqa: E731
    return left.withColumn("stem", stem(left_path)).join(
        right.withColumn("stem", stem(right_path)), "stem", "inner"
    )
