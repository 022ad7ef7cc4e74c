"""Data-quality validation — a Deequ-style constraint report as one
declarative plan (training-data pipelines gate ingestion on exactly
these checks: null rates, domain ranges, key uniqueness, referential
integrity).

Three rule families, each mapped to its cheapest plan shape:

* row rules (null / range / regex / predicate) — ONE aggregate pass
  over the table: every rule is a conditional sum in the same
  map-side-combined agg, then unpivoted to (rule, n_violations) rows.
  Adding a rule adds a column to the agg, never a pass.
* uniqueness — one groupBy per declared key set (violations = rows in
  excess of one per key).
* referential integrity — one anti-join per declared reference
  (violations = orphan child rows).

The report is a single unioned DataFrame, so it composes with sinks,
oracles, and Observation like any other query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_report(
    df: DataFrame,
    row_rules: dict[str, Column] | None = None,
    unique_keys: dict[str, list[str]] | None = None,
    refs: dict[str, tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Build the constraint-violation report.

    ``row_rules``  — name → violation predicate (true = bad row).
    ``unique_keys``— name → key columns that must be unique together.
    ``refs``       — name → (child_col, parent_df, parent_col): child
                     values that must exist in the parent.

    Returns (rule string, n_violations long), one row per rule.
    """
    parts: list[DataFrame] = []
    if row_rules:
        wide = df.agg(
            *[
                F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
                for name, pred in row_rules.items()
            ]
        )
        parts.append(
            wide.unpivot([], list(row_rules), "rule", "n_violations")
        )
    for name, keys in (unique_keys or {}).items():
        dups = (
            df.groupBy(*keys)
            .agg(F.count("*").alias("__c"))
            .filter(F.col("__c") > 1)
            .agg(
                F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))
                .cast("long")
                .alias("n_violations")
            )
        )
        parts.append(dups.select(F.lit(name).alias("rule"), "n_violations"))
    for name, (child_col, parent, parent_col) in (refs or {}).items():
        orphans = (
            df.select(F.col(child_col).alias("__k"))
            .join(
                parent.select(F.col(parent_col).alias("__k")).distinct(),
                "__k",
                "left_anti",
            )
            .agg(F.count("*").cast("long").alias("n_violations"))
        )
        parts.append(orphans.select(F.lit(name).alias("rule"), "n_violations"))
    if not parts:
        raise ValueError("dq_report needs at least one rule")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
