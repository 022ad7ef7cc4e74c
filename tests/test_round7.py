"""Round-7 hardening: the four ADVICE fixes (empty-input PCA error,
non-int group_col in the reconstruction report, semantic_dedup's
actual-sample clamp) plus regression coverage for this round's new
catalog entries."""

import pytest
from pyspark.sql import functions as F

from automotive_translation_pipeline_spark.sources import load_testdata

SF = "/root/testdata/sf0.001"


def test_pca_fit_empty_input_raises_clear_error(spark):
    from automotive_translation_pipeline_spark.operators.embeddings import (
        pca_fit,
    )

    empty = spark.createDataFrame([], "embedding array<float>")
    with pytest.raises(ValueError, match="no non-null"):
        pca_fit(empty)


def test_pca_recon_report_string_group_col(spark):
    # The mapInPandas schema derives the group field's type from the
    # input — a string group key must work, not Arrow-cast-fail.
    from automotive_translation_pipeline_spark.operators.embeddings import (
        pca_reconstruction_report,
    )

    emb = load_testdata(spark, SF)["embeddings"].withColumn(
        "bucket", F.concat(F.lit("g"), (F.col("label") % 3).cast("string"))
    )
    rows = pca_reconstruction_report(emb, group_col="bucket", k=8).collect()
    assert {r.bucket for r in rows} == {"g0", "g1", "g2"}
    assert all(r.mean_recon_mse >= 0.0 for r in rows)


def test_pca_recon_report_int64_group_col(spark):
    from automotive_translation_pipeline_spark.operators.embeddings import (
        pca_reconstruction_report,
    )

    emb = load_testdata(spark, SF)["embeddings"].withColumn(
        "gid", (F.col("vec_id") % 2).cast("long")
    )
    rows = pca_reconstruction_report(emb, group_col="gid", k=8).collect()
    assert {r.gid for r in rows} == {0, 1}


def test_semantic_dedup_tiny_corpus_clamps_cells(spark):
    # n_cells is clamped against the ACTUAL fit rows: a 6-vector
    # corpus with a requested 64 cells must fit, not throw k > rows.
    from automotive_translation_pipeline_spark.operators.dedup import (
        semantic_dedup,
    )

    emb = load_testdata(spark, SF)["embeddings"].filter(F.col("vec_id") < 6)
    out = semantic_dedup(emb, n_cells=64, threshold=0.999)
    assert out.count() <= 6
