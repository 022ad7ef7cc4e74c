"""Graph analytics over candidate-pair graphs: PageRank and triangle
counting.

The dedup family already produces graphs (LSH candidate pairs,
connected components in operators/dedup.py); these operators answer
the next questions a curation pipeline asks of that graph: which
documents are HUBS of near-duplication (PageRank — a high-rank node is
copied by many things that are themselves copied), and how CLIQUEY is
a neighborhood (triangle count — template families triangulate,
chain-of-edits do not).

Scale shapes:
- PageRank is the classic iterate-until-k loop: each iteration is one
  join of the rank vector against the edge list keyed on source plus
  one keyed rollup on destination — identical partitioning every
  round, so a real cluster co-partitions edges once and reuses the
  exchange. Iterations build ONE deterministic plan (no driver data);
  pass checkpoint=True to truncate lineage per round like
  connected_components does.
- Triangle counting is the two-hop join on ordered edges
  (id_a < id_b): join (a,b)x(b,c) then close against (a,c). Ordering
  edges by id caps each triangle to exactly one counting and bounds
  the join fan-out by forward-degree; the classic further refinement
  (order by degree, not id) drops the bound to O(m^1.5) and slots in
  by swapping the ordering key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint: bool = False,
    ndigits: int = 4,
) -> DataFrame:
    """Power-iteration PageRank over a SYMMETRIC edge list (u, v) —
    every node must appear as a source, which symmetrized undirected
    graphs guarantee, so there is no dangling mass to redistribute.

    Returns (node, pr_rel) where pr_rel = rank * n_nodes — the
    scale-invariant form (1.0 == the uniform-rank baseline), stable to
    report at any corpus size.
    """
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("__outdeg"))
    n = deg.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    ranks = (
        deg.select(F.col("u").alias("node"))
        .crossJoin(F.broadcast(n))
        .select("node", (F.lit(1.0) / F.col("__n")).alias("r"))
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges["u"] == ranks["node"])
            .join(deg, "u")
            .select(
                F.col("v").alias("node"),
                (F.col("r") / F.col("__outdeg")).alias("__c"),
            )
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("__c").alias("__sum"))
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + damping * F.col("__sum")
                ).alias("r"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.crossJoin(F.broadcast(n)).select(
        "node", F.round(F.col("r") * F.col("__n"), ndigits).alias("pr_rel")
    )


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """Per-node triangle participation over an ordered edge list
    (id_a < id_b, one row per undirected edge).

    Each triangle a<b<c is found exactly once as
    (a,b) x (b,c) closed by (a,c); its count lands on all three
    nodes. Returns (node, n_triangles) for nodes in >= 1 triangle.
    """
    e1 = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    e2 = pairs.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    e3 = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    per_corner = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return per_corner.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
