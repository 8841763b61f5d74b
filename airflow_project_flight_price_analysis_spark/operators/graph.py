"""Distributed connected components — transitive closure for near-dup
groups (completes operators/dedup.minhash_dedup, whose greedy pair-drop
is documented as an approximation of the true duplicate clusters).

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round, a node's label becomes the min of its own
and its neighbors' labels; converged when no label changes. Rounds are
pure DataFrame joins/aggregations (distributed; the driver only runs the
loop and the convergence check — a scalar count per round, never data).
Label propagation converges in O(diameter) rounds; near-dup clusters are
shallow (dozens of docs), so a handful of rounds suffice — the same
regime the large-star/small-star construction (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) optimizes for giant
graphs.

Scale notes:
- ``localCheckpoint`` each round truncates lineage — without it the plan
  doubles per iteration and planning time explodes by round ~10. On a
  cluster with HDFS, ``checkpoint`` (reliable) replaces it.
- Every round shuffles edges⋈labels on node id; edges are re-used from
  the persisted symmetric edge list (one materialization).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "a", dst: str = "b",
                         max_iter: int = 25) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node
    id reachable. Raises if not converged within ``max_iter`` rounds."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = sym.select(F.col("u").alias("node")).distinct() \
        .withColumn("label", F.col("node"))
    try:
        for _ in range(max_iter):
            nb = (
                sym.join(labels.select(F.col("node").alias("v"), "label"), "v")
                .groupBy("u").agg(F.min("label").alias("nb_label"))
                .select(F.col("u").alias("node"), "nb_label")
            )
            new_labels = (
                labels.join(nb, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"),
                        F.coalesce("nb_label", F.col("label")),
                    ).alias("label"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.select("node", F.col("label").alias("new_label"))
                .join(labels, "node")
                .filter(F.col("new_label") != F.col("label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels.select("node", F.col("label").alias("component"))
    finally:
        sym.unpersist()
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def neardup_clusters(df: DataFrame, pairs: DataFrame, id_col: str,
                     src: str = "a", dst: str = "b") -> DataFrame:
    """Assign every row its duplicate-cluster id: the min id of its
    connected component in the near-dup pair graph; singletons (no pair)
    are their own cluster. Exact transitive semantics — the closure the
    greedy ``minhash_dedup`` approximates."""
    comp = connected_components(pairs, src, dst)
    return (
        df.join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("cluster_id", F.coalesce("component", F.col(id_col)))
        .drop("component")
    )


def dedup_transitive(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Keep exactly one row (the min id) per duplicate cluster."""
    clustered = neardup_clusters(df, pairs, id_col)
    return (
        clustered.filter(F.col(id_col) == F.col("cluster_id"))
        .drop("cluster_id")
    )
