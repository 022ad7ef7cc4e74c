"""Similarity search over embedding columns (BASELINE.json extension
surface; background: REPOSE ICDE'21 / Odyssey VLDB'23 in PAPERS.md).

Two paths:

* ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query
  set against the corpus, JVM-side ``zip_with``/``aggregate`` dot
  product, per-query window top-k. At 100 TB the corpus side stays
  partitioned; each partition scores locally and the window reduces
  k·|Q| rows — no corpus shuffle at all.
* ``cosine_topk_lsh`` — approximate: random-hyperplane (SRP) bucketing
  prunes the corpus to same-bucket candidates before exact scoring.
  The classic recall/cost trade; bucket width = ``n_planes`` bits.

Everything is native column expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: for every query vector, the k nearest corpus
    vectors (self-matches excluded when ids collide).

    Returns (query_id, vec_id, cosine) with deterministic tie-break on
    vec_id.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cvec"), _norm(F.col(vec_col)).alias("__cnorm")
    )
    scored = (
        c.crossJoin(F.broadcast(q.withColumn("__qnorm", _norm(F.col("__qvec")))))
        .filter(F.col(query_id_col) != F.col(id_col))
        .withColumn(
            "cosine",
            _dot(F.col("__qvec"), F.col("__cvec")) / (F.col("__qnorm") * F.col("__cnorm")),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(query_id_col, id_col, "cosine")
    )


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: one bit per hyperplane
    (sign of the dot product), packed into a long."""
    out = F.lit(0)
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out


def _deterministic_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Pseudo-random hyperplanes from a fixed LCG — deterministic across
    runs/engines without numpy state."""
    planes, seed = [], 0x2545F491
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            seed = (seed * 1103515245 + 12345) % (1 << 31)
            row.append(seed / float(1 << 31) - 0.5)
        planes.append(row)
    return planes


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k: SRP-bucket both sides, score only
    same-bucket pairs. Recall < 1.0 by design; the scale path when the
    corpus is too big to brute-force per query."""
    planes = _deterministic_planes(n_planes, dim)
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qvec"),
        srp_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__cvec"),
        srp_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col(query_id_col) != F.col(id_col))
        .withColumn(
            "cosine",
            _dot(F.col("__qvec"), F.col("__cvec"))
            / (_norm(F.col("__qvec")) * _norm(F.col("__cvec"))),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(query_id_col, id_col, "cosine")
    )


def _probe_and_score(
    assigned: DataFrame,
    cent_df: DataFrame,
    queries: DataFrame,
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Shared IVF tail: pick each query's ``n_probe`` nearest cells,
    score exactly within them, window top-k."""
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qvec"),
        _norm(F.col(vec_col)).alias("__qnorm"),
    )
    probe_w = Window.partitionBy(query_id_col).orderBy(
        F.col("__csim").desc(), F.col("__cell")
    )
    probes = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn(
            "__csim",
            _dot(F.col("__qvec"), F.col("__centroid"))
            / (F.col("__qnorm") * _norm(F.col("__centroid"))),
        )
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= n_probe)
        .select(query_id_col, "__cell", "__qvec", "__qnorm")
    )
    scored = (
        assigned.join(F.broadcast(probes), "__cell")
        .filter(F.col(query_id_col) != F.col(id_col))
        .withColumn(
            "cosine",
            _dot(F.col("__qvec"), F.col(vec_col))
            / (F.col("__qnorm") * _norm(F.col(vec_col))),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(query_id_col, id_col, "cosine")
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """IVF-style approximate top-k: KMeans coarse quantizer partitions
    the corpus into cells; each query probes only its ``n_probe``
    nearest cells and scores exactly within them.

    This is the 10^9-vector shape (Odyssey/REPOSE in PAPERS.md): the
    corpus is scanned once to train/assign, queries touch
    ``n_probe/n_cells`` of the data, and the cell assignment can be
    written as a partition column so probes become partition pruning.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("__feat"),
    )
    model = KMeans(k=n_cells, seed=seed, featuresCol="__feat").fit(vecs)
    assigned = model.transform(vecs).select(
        id_col, vec_col, F.col("prediction").alias("__cell")
    )
    centroids = [
        [float(x) for x in c] for c in model.clusterCenters()
    ]
    cent_df = corpus.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "__cell int, __centroid array<double>",
    )
    return _probe_and_score(
        assigned, cent_df, queries, k, n_probe, id_col, vec_col, query_id_col
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Persist an IVF index: the corpus written PARTITIONED BY its
    coarse-quantizer cell, plus the centroid table.

    This turns cell probing into *partition pruning*: a query batch
    that probes cells {3, 7} reads only ``cell=3/`` and ``cell=7/``
    directories — at 10^9 vectors the index build is one scan + one
    shuffle-free write, and every query batch after it touches
    ``n_probe/n_cells`` of the FILES, not just of the rows.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("__feat"),
    )
    model = KMeans(k=n_cells, seed=seed, featuresCol="__feat").fit(vecs)
    # "cell" (no underscore prefix): underscore-led paths are treated
    # as hidden by the file readers.
    assigned = model.transform(vecs).select(
        id_col, vec_col, F.col("prediction").alias("cell")
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/corpus")
    cent_rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    corpus.sparkSession.createDataFrame(
        cent_rows, "cell int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def cosine_topk_ivf_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k over a persisted IVF index
    (:func:`build_ivf_index`).

    The union of probed cells across the query batch is tiny (bounded
    by ``n_cells`` integers, independent of corpus size), so it is
    collected and applied as a STATIC ``IN`` filter on the partition
    column — the scan's ``PartitionFilters`` then skip every un-probed
    cell directory (plan-contract-tested)."""
    cent_df = (
        spark.read.parquet(f"{index_path}/centroids")
        .select(F.col("cell").alias("__cell"), F.col("centroid").alias("__centroid"))
    )
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qvec"),
        _norm(F.col(vec_col)).alias("__qnorm"),
    )
    probe_w = Window.partitionBy(query_id_col).orderBy(
        F.col("__csim").desc(), F.col("__cell")
    )
    probed_cells = [
        r["__cell"]
        for r in (
            q.crossJoin(F.broadcast(cent_df))
            .withColumn(
                "__csim",
                _dot(F.col("__qvec"), F.col("__centroid"))
                / (F.col("__qnorm") * _norm(F.col("__centroid"))),
            )
            .withColumn("__pr", F.row_number().over(probe_w))
            .filter(F.col("__pr") <= n_probe)
            .select("__cell")
            .distinct()
            .collect()
        )
    ]
    assigned = (
        spark.read.parquet(f"{index_path}/corpus")
        .filter(F.col("cell").isin(probed_cells))
        .withColumnRenamed("cell", "__cell")
    )
    return _probe_and_score(
        assigned, cent_df, queries, k, n_probe, id_col, vec_col, query_id_col
    )
