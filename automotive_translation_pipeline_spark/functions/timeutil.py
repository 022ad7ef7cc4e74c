"""Time functions (SURVEY §2.9: F-15, F-17)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_unix_ts(c: Column) -> Column:
    """F-15: unix seconds → 'yyyy-MM-dd HH:mm:ss' display string.
    Reference: ``batch_tracker.py:40-46`` (datetime.fromtimestamp)."""
    return F.from_unixtime(c, "yyyy-MM-dd HH:mm:ss")


def run_id(stem: Column, ts: Column) -> Column:
    """F-17: unique run id ``{stem}_{unix_ts}``.
    Reference: ``auto_translate.py:1766-1768``."""
    return F.concat(stem, F.lit("_"), ts.cast("string"))
