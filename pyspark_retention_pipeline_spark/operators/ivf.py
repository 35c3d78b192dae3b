"""IVF-style approximate nearest neighbor: KMeans coarse quantizer + probed
partition search (the third leg of the similarity triad: exact brute force →
LSH buckets → IVF cells).

Index build: seeded MLlib KMeans over the embeddings assigns every vector to
a cell. Search: each query scores only vectors in its ``n_probe`` nearest
cells — the candidate set shrinks by ~n_cells/n_probe while recall stays high
for clustered data. At 100 TB the cell assignment is a write-time partition
column (partition pruning does the probing for free); here it is a runtime
join against the assignment frame. Recall vs. brute force is property-tested.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import as_double_array, dot
from ..registry import query
from ..tables import load_table
from .similarity import N_QUERIES, TOP_K

N_CELLS = 16
N_PROBE = 4
SEED = 42


def build_ivf_index(emb: DataFrame, n_cells: int = N_CELLS, seed: int = SEED):
    """Fit the coarse quantizer and return (assigned, centroids).

    assigned: vec_id, v array<double>, cell — the vector rides along with
    its cell assignment so the search's candidate side is the transform
    output itself, NOT a second scan of the embeddings table joined back to
    the assignments (the join form read embeddings 3× per ivf_knn plan —
    round-8 registry scan audit; at 100 TB the assignment is a write-time
    partition column and this frame is the partitioned table itself).
    centroids: cell, centroid array<double> (K rows, driver-built).
    """
    vecs = emb.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    feats = vecs.withColumn("features", array_to_vector(F.col("v")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell").fit(feats)
    assigned = model.transform(feats).select("vec_id", "v", "cell")
    centroids = emb.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    queries_df: DataFrame,
    centroids: DataFrame,
    n_probe: int = N_PROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """Probe the n_probe closest cells per query, then exact cosine within
    the probed cells only."""
    q = queries_df.select(
        F.col("vec_id").alias("query_id"), as_double_array(F.col("embedding")).alias("qv")
    ).withColumn("qn", F.sqrt(dot(F.col("qv"), F.col("qv"))))

    # Cell probing: distance query → centroid (centroids are tiny: broadcast).
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "qv",
        "qn",
        "cell",
        dot(F.col("qv"), F.col("centroid")).alias("cdot"),
        F.sqrt(dot(F.col("centroid"), F.col("centroid"))).alias("cnorm"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        (F.col("cdot") / (F.col("qn") * F.col("cnorm"))).desc(), F.col("cell")
    )
    probed = (
        qc.withColumn("crn", F.row_number().over(wq))
        .filter(F.col("crn") <= n_probe)
        .select("query_id", "qv", "qn", "cell")
    )

    cands = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.sqrt(dot(F.col("v"), F.col("v"))).alias("cn"),
        "cell",
    )

    pairs = (
        cands.join(F.broadcast(probed), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"))
    )


@query("ivf_knn", tags=("similarity", "ann-ivf"))
def ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k for the standard query set (vec_id < N_QUERIES); rows-only
    (KMeans iterations are not SQL-expressible — SURVEY §7). Two embeddings
    scans per plan: the assigned-candidates frame and the literal-bounded
    query slice."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = build_ivf_index(emb)
    return ivf_search(assigned, emb.filter(F.col("vec_id") < N_QUERIES), centroids)


LLOYD_K = 8
LLOYD_ITERS = 4


@query("kmeans_lloyd_curve", tags=("similarity", "kmeans", "iterative"))
def kmeans_lloyd_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means expressed in pure DataFrame operators — the
    iterative-algorithm pattern (bounded driver loop, all per-row work
    declarative) that :mod:`.components`' label propagation uses for
    graphs, applied to clustering: per iteration, assignment is an argmin
    over a broadcast centroid frame (struct-MIN, no window) and the update
    is a posexplode-avg per cluster; the convergence curve (per-iteration
    mean squared distance) is the output. Deterministic: seeds are the
    first {LLOYD_K} vec_ids, and every reduction is an exact avg over a
    fixed grouping — no RNG anywhere. Rows-only: {LLOYD_ITERS} chained
    shuffles have no single-query SQL twin (DuckDB would need the same
    loop); the per-step math is pinned against numpy in
    tests/test_similarity.py. MLlib's KMeans (build_ivf_index) remains the
    production trainer; this is the engine-level form that scales each
    step as ordinary joins/aggs — corpus × K distance rows per iteration,
    centroid frame always K rows."""
    from ..exprs import as_double_array

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    cent = (
        emb.filter(F.col("vec_id") < LLOYD_K)
        .select(F.col("vec_id").cast("int").alias("cell"), F.col("v").alias("c"))
    )
    dist2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    curve = []
    for it in range(1, LLOYD_ITERS + 1):
        scored = emb.crossJoin(F.broadcast(cent)).select(
            "vec_id", "v", F.struct(dist2.alias("d2"), F.col("cell")).alias("dc")
        )
        assigned = scored.groupBy("vec_id").agg(
            F.min("dc").alias("best"), F.first("v").alias("v")
        ).localCheckpoint(eager=False)  # one materialization for stats + update
        stats = assigned.agg(
            F.round(F.avg("best.d2"), 6).alias("inertia"),
            F.count_distinct("best.cell").alias("n_cells"),
        ).collect()[0]
        curve.append((it, float(stats.inertia), int(stats.n_cells)))
        cent = (
            assigned.select(
                F.col("best.cell").alias("cell"), F.posexplode("v").alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cell", F.transform(F.col("pm"), lambda s: s["m"]).alias("c")
            )
            .localCheckpoint(eager=False)
        )
    return spark.createDataFrame(
        curve, "iteration int, inertia double, n_cells long"
    )
