"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship translation-pipeline summary at
sf0.001. ``queries()``/``oracle_sql()`` declare the operator inventory
from SURVEY.md §2 with DuckDB oracle twins; built up milestone by
milestone.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from automotive_translation_pipeline_spark import queries_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from automotive_translation_pipeline_spark.plans import (
        translation_pipeline_summary,
    )

    return translation_pipeline_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every SQL-expressible query."""
    return queries_catalog.oracle_sql()
