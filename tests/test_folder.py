"""Folder-orchestrator plan tests (SURVEY §3.3): multi-CSV input in one
Spark job with per-file lineage."""

from __future__ import annotations

import pyspark.sql.functions as F

from automotive_translation_pipeline_spark.plans.folder import (
    folder_pipeline,
    folder_summary,
)


def _write_csvs(tmp_path, n_files=3, rows_per_file=20):
    d = tmp_path / "csvs"
    d.mkdir()
    for f in range(n_files):
        lines = ["description_id,english_sentence"]
        for i in range(rows_per_file):
            lines.append(f"F{f}R{i:03d},sentence {i} from file {f} with words")
        # One blank row per file to exercise R-7.
        lines.append(f"F{f}BLANK,   ")
        (d / f"input_{f}.csv").write_text("\n".join(lines) + "\n")
    return str(d)


def test_folder_pipeline_lineage(spark, tmp_path):
    d = _write_csvs(tmp_path)
    rows = folder_pipeline(spark, d)
    stems = {r["source_stem"] for r in rows.select("source_stem").distinct().collect()}
    assert stems == {"input_0", "input_1", "input_2"}
    # Blank rows filtered; 20 rows per file survive.
    counts = {
        r["source_stem"]: r["n"]
        for r in rows.groupBy("source_stem").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"input_0": 20, "input_1": 20, "input_2": 20}
    # Batches never span files.
    cross = (
        rows.select("batch_id", "source_stem")
        .distinct()
        .groupBy("batch_id")
        .agg(F.countDistinct("source_stem").alias("n_files"))
        .filter(F.col("n_files") > 1)
    )
    assert cross.count() == 0


def test_folder_summary(spark, tmp_path):
    d = _write_csvs(tmp_path, n_files=2, rows_per_file=15)
    s = {r["source_stem"]: r for r in folder_summary(spark, d).collect()}
    assert set(s) == {"input_0", "input_1"}
    for r in s.values():
        assert r["total_rows"] == 15
        assert r["successful"] + r["failed"] == 15
        assert r["n_batches"] >= 1
