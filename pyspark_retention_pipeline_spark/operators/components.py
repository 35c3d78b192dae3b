"""Connected components over candidate-pair edges — the clustering step that
turns near-duplicate PAIRS (minhash/LSH output) into duplicate GROUPS with a
canonical representative (what a dedup pipeline actually deletes against).

Algorithm: minimum-label propagation accelerated with pointer jumping — each
round every vertex adopts the smallest id among itself and its neighbors
(one hop), then labels are compressed through the label graph
(``component ← label(component)``), the path-halving trick from the
map-reduce connected-components family (public literature, e.g. Kiveris et
al.'s large-star/small-star analysis). One-hop propagation alone needs
O(diameter) rounds and silently returns split clusters when the round budget
runs out on a long chain (round-1 advisor finding); with jumping, label
distance doubles per round, so convergence is O(log diameter) and the
default budget covers diameters in the thousands. Non-convergence raises
instead of returning wrong labels. Each round materializes via
``localCheckpoint`` to cut the growing lineage — the scale-critical detail
for iterative DataFrame algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# curation is imported BEFORE components in operators/__init__, so this
# module-level import neither cycles nor reorders query registration.
from .curation import GROUP_AWARE_SPLIT_ORACLE


def connected_components(edges: DataFrame, max_iter: int = 15) -> DataFrame:
    """(src, dst) undirected edges → (vertex, component) with component = min
    vertex id in each connected component.

    Pure DataFrame iteration: no driver-side graph, no RDDs; per round one
    shuffle for the neighbor-min aggregate plus one label-compression join.
    Stops early when a round changes no labels (a 1-row count per round —
    bounded driver traffic); raises if ``max_iter`` rounds exhaust while
    labels are still moving (returning partially-converged labels would
    silently report split clusters as distinct groups).
    """
    # The symmetric edge frame is consumed by EVERY round's neighbor-min
    # join, and each round is its own action — unpinned, the entire edge
    # derivation (LSH candidate join, verify filter, distinct, this union)
    # re-executed per round (round-8 review finding; the multi-branch
    # recompute trap, iterated). One lazy pin materializes it at round 1.
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
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
        # Carry the pre-round label ("old") through the hop so the change
        # test at the end is a column comparison, not another full join back
        # to `labels` (one join per round saved — round-4 audit).
        hopped = labels.join(neighbor_min, "vertex", "left").select(
            "vertex",
            F.col("component").alias("old"),
            F.least(
                F.col("component"), F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
        )
        # Pointer jumping: compress component → label(component). Every
        # component id is itself a vertex id, so the lookup always resolves;
        # label distance to the root doubles per round.
        lbl = hopped.select(
            F.col("vertex").alias("c_vertex"), F.col("component").alias("c_component")
        )
        updated = (
            hopped.join(lbl, hopped.component == lbl.c_vertex, "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("c_component", F.col("component"))
                ).alias("component"),
                "old",
            )
            .select(
                "vertex", "component", (F.col("component") < F.col("old")).alias("_changed")
            )
            .localCheckpoint()
        )
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(graph diameter > 2^{max_iter}); raise max_iter"
    )


def cluster_assignment_frame(edges: DataFrame) -> DataFrame:
    """(src, dst) candidate edges → (doc_id, canonical_id, cluster_size):
    connected components plus the per-component size join — the single
    definition of the clustering output contract shared by
    :func:`dedup_clusters` (xxhash64 edges) and
    ``curation.dedup_clusters_portable`` (portable md5 edges, oracle-
    checked); round-10 review: the tail was duplicated in both."""
    comp = connected_components(edges)
    sizes = comp.groupBy("component").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        F.col("vertex").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        "cluster_size",
    )


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
    return cluster_assignment_frame(pairs)


def group_assignment_frame(
    docs: DataFrame, edges: DataFrame, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, *extra_cols, canonical_id, split): near-dup components over
    ``edges`` (src/dst) → canonical id = component minimum (singletons are
    their own canonical via left join + coalesce, no densification) → the
    md5 90/5/5 bucket keyed on the CANONICAL id, so every member of a
    cluster lands on the same split side. The one implementation behind
    :func:`group_aware_split` (simhash edges), ``curate_corpus_neardup``
    (minhash edges, lang threaded through), and the leakage audit — the
    composition previously lived copy-pasted in each (round-8 review
    finding)."""
    from .sampling import split_assignment_frame

    comp = connected_components(edges)
    base = (
        docs.select("doc_id", *extra_cols)
        .join(
            comp.select(F.col("vertex").alias("doc_id"), "component"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            *extra_cols,
            F.coalesce("component", "doc_id").alias("canonical_id"),
        )
    )
    return split_assignment_frame(base, "canonical_id").select(
        "doc_id", *extra_cols, "canonical_id", "split"
    )


@query(
    "group_aware_split",
    oracle=GROUP_AWARE_SPLIT_ORACLE,
    tags=("curation", "split", "leakage", "dedup-neardup"),
)
def group_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remedy :func:`~.curation.split_leakage_check` prescribes, shipped
    as an operator: assign train/val/test by the md5 bucket of each
    document's near-dup CLUSTER canonical id, not its own doc_id, so every
    member of a near-duplicate group lands on the same side of every split
    boundary by construction.

    Pipeline: SimHash banded-LSH pairs (hamming ≤ 3, the same edge set the
    leakage audit flags) → connected components → canonical id = component
    minimum; singleton docs are their own canonical (left join + coalesce,
    no densification). The split hash then keys on the canonical id via the
    same :func:`~.sampling.split_assignment_frame` the i.i.d. split uses.
    Oracle-checked since round 10 (was rows-only): the portable simhash
    pairs and the leakage audit's unrolled hook+jump fixpoint re-derive
    every (doc_id, canonical_id, split) row in DuckDB — a pure check
    upgrade, the plan is unchanged. The zero-leakage guarantee — NO
    hamming-≤3 pair straddles a split — remains pinned by
    ``tests/test_curation.py::test_group_aware_split_eliminates_leakage``.
    """
    from .text import simhash_candidate_frame

    d = load_table(spark, sf_dir, "documents")
    edges = simhash_candidate_frame(d).select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    )
    return group_assignment_frame(d, edges)
