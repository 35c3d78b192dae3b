"""Connected components over candidate-pair edges — the clustering step that
turns near-duplicate PAIRS (minhash/LSH output) into duplicate GROUPS with a
canonical representative (what a dedup pipeline actually deletes against).

Algorithm: iterative minimum-label propagation (each vertex repeatedly adopts
the smallest component id among itself and its neighbors) — the standard
DataFrame-only formulation (public large-graph literature, e.g. the
map-reduce CC family): a join + aggregate per round, O(diameter) rounds,
converging very fast on dedup graphs (clusters are tiny and dense). Each
round materializes via ``localCheckpoint`` to cut the growing lineage — the
scale-critical detail for iterative DataFrame algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


def connected_components(edges: DataFrame, max_iter: int = 10) -> DataFrame:
    """(src, dst) undirected edges → (vertex, component) with component = min
    vertex id in each connected component.

    Pure DataFrame iteration: no driver-side graph, no RDDs; per round one
    shuffle for the neighbor-min aggregate. Stops early when a round changes
    no labels (a 1-row count per round — bounded driver traffic).
    """
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.vertex)
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("nbr_component", F.col("component")) < F.col("component")
                ).alias("_changed"),
            )
        ).localCheckpoint()
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    return labels


@query("dedup_clusters", tags=("dedup-neardup", "connected-components"))
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup clustering: minhash-LSH candidate pairs →
    connected components → one row per clustered doc with its canonical
    (minimum) doc id and cluster size. Rows-only (iterative algorithm,
    SURVEY §7)."""
    from .text import minhash_candidate_pairs

    pairs = minhash_candidate_pairs(load_table(spark, sf_dir, "documents")).select(
        F.col("d1").alias("src"), F.col("d2").alias("dst")
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("vertex").alias("doc_id"),
            F.col("component").alias("canonical_id"),
            "cluster_size",
        )
    )
