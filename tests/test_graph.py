"""Connected components / transitive near-dup closure (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_project_flight_price_analysis_spark.operators.dedup import (
    minhash_neardup_pairs,
)
from airflow_project_flight_price_analysis_spark.operators.graph import (
    connected_components,
    dedup_transitive,
    neardup_clusters,
)
from airflow_project_flight_price_analysis_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_connected_components_known_graph(spark):
    # chain 1-2-3-4, pair 10-11, triangle 20-21-22 (+ redundant edge)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["a", "b"],
    )
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20}


def test_neardup_clusters_and_transitive_dedup(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    pairs = minhash_neardup_pairs(docs, "text", "doc_id", threshold=0.5)
    clustered = neardup_clusters(docs, pairs, "doc_id")
    assert clustered.count() == docs.count()
    # cluster_id is always ≤ the member id, and is a member of the cluster
    assert clustered.filter(F.col("cluster_id") > F.col("doc_id")).count() == 0
    survivors = dedup_transitive(docs, pairs, "doc_id")
    n_clusters = clustered.select("cluster_id").distinct().count()
    assert survivors.count() == n_clusters
    # paired docs collapse: survivors < total when any pair exists
    if pairs.count() > 0:
        assert survivors.count() < docs.count()
    # transitivity: both endpoints of every pair share a cluster
    c = clustered.select("doc_id", "cluster_id")
    pa = pairs.join(c.withColumnRenamed("doc_id", "a"), "a") \
              .withColumnRenamed("cluster_id", "ca")
    pb = pa.join(c.withColumnRenamed("doc_id", "b"), "b") \
           .withColumnRenamed("cluster_id", "cb")
    assert pb.filter(F.col("ca") != F.col("cb")).count() == 0
