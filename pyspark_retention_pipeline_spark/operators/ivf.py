"""IVF-style approximate nearest neighbor: coarse quantizer + probed
partition search (the third leg of the similarity triad: exact brute force →
LSH buckets → IVF cells).

Index build: a coarse codebook assigns every vector to a cell. Search: each
query scores only vectors in its ``n_probe`` nearest cells — the candidate
set shrinks by ~n_cells/n_probe while recall stays high for clustered data.
At 100 TB the cell assignment is a write-time partition column (partition
pruning does the probing for free); here it is a runtime join against the
assignment frame. Recall vs. brute force is property-tested.

Two quantizers, one search path:

* :func:`build_ivf_index` — seeded MLlib KMeans, the production trainer
  (better cells on clustered corpora). Not SQL-expressible, so plans built
  on it check rows-only; recall is property-tested.
* The REGISTERED :func:`ivf_knn` query uses a DETERMINISTIC codebook — the
  ``N_CELLS`` vectors ranking first by ``md5(vec_id)`` (a deterministic
  pseudo-random sample, the classic random-codebook IVF baseline). Every
  stage (codebook → argmax assignment → probe → exact rank) is then
  re-derivable in ANSI SQL, so the END-TO-END search path is hash-checked
  against DuckDB (round-9 verdict item 5 — previously the one similarity
  op with no oracle).
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


# Corpus → norms → deterministic md5 codebook → per-vector argmax cell:
# shared between the end-to-end search oracle (ivf_knn) and the probe
# operating-point scorecard oracle (ivf_probe_recall) — one definition so
# the assignment convention cannot drift between the search path and its
# recall report (the _SEMDEDUP_ASSIGN_CTES rule, applied to this tier).
_IVF_BASE_CTES = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS MATERIALIZED (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ), code AS MATERIALIZED (
      -- deterministic codebook: the N_CELLS vectors ranking first by
      -- md5(vec_id); cell id = rank in that order (ties impossible past
      -- vec_id). Mirrors deterministic_codebook_frame exactly.
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                vec_id) AS cell,
             v AS cv, nrm AS cnrm
      FROM (SELECT vec_id, v, nrm FROM n
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {N_CELLS})
    ), assign AS MATERIALIZED (
      -- argmax over rounded cosine, lowest cell on ties — the SQL twin of
      -- the in-row array_max(struct(c, -cell)) fold
      SELECT vec_id, v, nrm, cell FROM (
        SELECT n.vec_id, n.v, n.nrm, code.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY ROUND(list_dot_product(n.v, code.cv)
                                / (n.nrm * code.cnrm), 6) DESC, code.cell
               ) AS rn
        FROM n CROSS JOIN code) WHERE rn = 1
    )"""

_IVF_ORACLE = _IVF_BASE_CTES + f""", probed AS (
      SELECT vec_id AS query_id, v AS qv, nrm AS qn, cell FROM (
        SELECT n.vec_id, n.v, n.nrm, code.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY ROUND(list_dot_product(n.v, code.cv)
                                / (n.nrm * code.cnrm), 6) DESC, code.cell
               ) AS rn
        FROM n CROSS JOIN code WHERE n.vec_id < {N_QUERIES})
      WHERE rn <= {N_PROBE}
    ), pairs AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             ROUND(list_dot_product(p.qv, a.v) / (p.qn * a.nrm), 6) AS cosine
      FROM probed p JOIN assign a
        ON a.cell = p.cell AND a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM pairs) WHERE rn <= {TOP_K}
"""


def deterministic_codebook_frame(staged: DataFrame, k: int = N_CELLS) -> DataFrame:
    """ONE-row frame whose ``cb`` column is the deterministic codebook:
    array<struct<cell int, cv array<double>, cnrm double>>, cell = 1-based
    rank by ``(md5(vec_id), vec_id)`` over the ``k`` md5-first vectors.

    ``staged`` must carry (vec_id, v, nrm). The md5 ranking is a
    TakeOrdered (orderBy + LIMIT — never a corpus global sort), and the
    codebook collapses to one array row so consumers fold over it IN-ROW
    after a broadcast cross join — assignment needs no shuffle at all."""
    md5k = F.md5(F.col("vec_id").cast("string"))
    ranked = (
        staged.select(md5k.alias("k"), "vec_id", "v", "nrm")
        .orderBy("k", "vec_id")
        .limit(k)
    )
    return ranked.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "k",
                        "vec_id",
                        F.col("v").alias("cv"),
                        F.col("nrm").alias("cnrm"),
                    )
                )
            ),
            lambda s, i: F.struct(
                (i + 1).cast("int").alias("cell"),
                s["cv"].alias("cv"),
                s["cnrm"].alias("cnrm"),
            ),
        ).alias("cb")
    )


@query("ivf_knn", oracle=_IVF_ORACLE, tags=("similarity", "ann-ivf"))
def ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k for the standard query set (vec_id < N_QUERIES), fully
    oracle-checked end to end (round-9 verdict item 5; was rows-only behind
    MLlib KMeans — the production trainer stays :func:`build_ivf_index`,
    exercised by tests/test_similarity.py, while the registered query uses
    the deterministic md5 codebook so DuckDB re-derives every stage).

    Shape, and why it scales: ONE pinned embeddings pass carries
    (vec_id, v, nrm); the codebook is a TakeOrdered + 1-row collect_list
    aggregate (K·dim doubles — broadcastable by construction); assignment
    is an IN-ROW argmax fold over the broadcast codebook array — zero
    shuffle for the corpus-wide stage, where a window/groupBy form would
    shuffle n·K rows (at 100 TB the assignment column is write-time
    partitioning and this stage disappears into the layout). Probing
    reuses the same staged score array on the bounded query slice
    (top-``N_PROBE`` via in-row sort, no window), and only the probed
    cells' members reach the final per-query rank. Ranking is on the
    ROUNDED cosine with a neighbor-id tie-break — the cross-engine 1-ulp
    rule every similarity oracle here follows."""
    # fan_out (round 16): byte-sized target A/B 0.95 → 0.43 s best-of-3 —
    # the checkpointed cell-score ladder ran single-task off the
    # single-row-group scan.
    e = load_table(spark, sf_dir, "embeddings", fan_out=True)
    staged = (
        e.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
        .withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
        .localCheckpoint(eager=False)  # feeds codebook + corpus + query slice
    )
    cb = deterministic_codebook_frame(staged)
    withcb = staged.crossJoin(F.broadcast(cb))
    # Rounded cosine to every centroid, staged as ONE array column; the
    # struct carries -cell so lexicographic array_max = (highest cosine,
    # lowest cell) — branch-free, no per-element when/otherwise recompute.
    scored_col = F.transform(
        F.col("cb"),
        lambda x: F.struct(
            F.round(
                dot(F.col("v"), x["cv"]) / (F.col("nrm") * x["cnrm"]), 6
            ).alias("c"),
            (-x["cell"]).alias("negcell"),
        ),
    )
    scored = withcb.select("vec_id", "v", "nrm", scored_col.alias("scored"))
    assigned = scored.select(
        "vec_id",
        "v",
        "nrm",
        (-F.array_max("scored")["negcell"]).cast("int").alias("cell"),
    )
    # Query probing: top-N_PROBE cells via in-row sort of the same score
    # array (reverse(array_sort) = cosine desc, cell asc on ties — the
    # exact order the oracle's window ranks).
    probed = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.explode(
                F.slice(F.reverse(F.array_sort("scored")), 1, N_PROBE)
            ).alias("p"),
        )
        .select(
            "query_id", "qv", "qn", (-F.col("p")["negcell"]).cast("int").alias("cell")
        )
    )
    pairs = (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine")
    )


LLOYD_K = 8
LLOYD_ITERS = 4
# Fixed-point scale for the two cross-partition reductions (inertia sum,
# centroid component sums): quantize-to-BIGINT before summing so partial-
# aggregation order can't move a double (exprs.scaled_sum rule). Σ of
# round(d2·10⁶) stays far under 2^63 for any corpus this engine targets
# (d2 ≤ ~4·dim for unit-ish vectors → ~2.6·10⁸ per row → 2^63 at ~3·10¹⁰
# rows); component sums are even smaller.
_LLOYD_SCALE = 1_000_000


def _lloyd_assign_sql(t: int, dim: int | None = None) -> str:
    """One unrolled Lloyd assignment round: argmin over c{t-1}'s centroids
    (ties → lowest cell), carrying the QUANTIZED squared distance
    (``qd2 = ROUND(d2·10⁶)`` as BIGINT). The argmin compares qd2, not the
    raw double: ranking raw d2 relied on bit-identical sequential FP
    between Spark's zip_with fold and DuckDB's list_dot_product — a step
    beyond the round-before-compare rule; an FMA/vectorization change in
    either engine could flip one assignment and cascade through every
    later iteration (round-10 ADVICE item 4). Quantizing first makes the
    comparison exact integer on both sides, and the inertia sum reuses the
    SAME qd2, so assignment and statistic can never disagree. Residual
    (ADVICE r11): 'exact integer on both sides' holds only after IDENTICAL
    rounding — the raw d2 doubles can still differ by ULPs between Spark's
    sequential zip_with fold and DuckDB's list_dot_product, and if d2·10⁶
    lands within that ULP gap of a half-integer the two engines' qd2
    differ by 1, flipping one assignment and cascading. Diagnose a future
    hash mismatch here by dumping per-vec qd2 at the flipped iteration.
    d2 is computed ONCE in an inner projection and the window orders by
    the alias — DuckDB is not guaranteed to CSE the 64-term fold across
    the projection and the sort key (round-10 review)."""
    from .similarity import _EMB_DIMS

    dim = _EMB_DIMS if dim is None else dim
    dv = f"[n.v[i + 1] - c.c[i + 1] FOR i IN range(0, {dim})]"
    return f"""a{t} AS MATERIALIZED (
      SELECT vec_id, v, cell, qd2 FROM (
        SELECT vec_id, v, cell, qd2,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY qd2, cell) AS rn
        FROM (SELECT vec_id, v, cell,
                     CAST(ROUND(d2 * {_LLOYD_SCALE}) AS BIGINT) AS qd2
              FROM (SELECT n.vec_id, n.v, c.cell,
                           list_dot_product({dv}, {dv}) AS d2
                    FROM e n CROSS JOIN c{t - 1} c))) WHERE rn = 1
    )"""


def _lloyd_update_sql(t: int) -> str:
    """Centroid update from a{t}: per-dim EXACT scaled-integer mean (the
    same quantization the Spark side applies), rebuilt as a list."""
    return f"""c{t} AS MATERIALIZED (
      SELECT cell, list(m ORDER BY dim) AS c FROM (
        SELECT cell, dim,
               SUM(CAST(ROUND(val * {_LLOYD_SCALE}) AS BIGINT))
                 / (COUNT(*) * {_LLOYD_SCALE}.0) AS m
        FROM (SELECT cell, generate_subscripts(v, 1) AS dim,
                     unnest(v) AS val FROM a{t})
        GROUP BY cell, dim) GROUP BY cell
    )"""


def _lloyd_oracle(iters: int = LLOYD_ITERS, k: int = LLOYD_K) -> str:
    parts = [
        f"""e AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), c0 AS (
      SELECT CAST(vec_id AS INT) AS cell, v AS c FROM e WHERE vec_id < {k}
    )"""
    ]
    stats = []
    for t in range(1, iters + 1):
        parts.append(_lloyd_assign_sql(t))
        if t < iters:
            parts.append(_lloyd_update_sql(t))
        stats.append(
            f"""SELECT {t} AS iteration,
           SUM(qd2) / (COUNT(*) * {_LLOYD_SCALE}.0) AS inertia,
           CAST(COUNT(DISTINCT cell) AS BIGINT) AS n_cells
    FROM a{t}"""
        )
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + "\n    "
        + "\n    UNION ALL\n    ".join(stats)
    )


@query(
    "kmeans_lloyd_curve",
    oracle=_lloyd_oracle(),
    tags=("similarity", "kmeans", "iterative"),
)
def kmeans_lloyd_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means expressed in pure DataFrame operators — the
    iterative-algorithm pattern (bounded driver loop, all per-row work
    declarative) that :mod:`.components`' label propagation uses for
    graphs, applied to clustering: per iteration, assignment is an argmin
    over a broadcast centroid frame (struct-MIN, no window) and the update
    is a posexplode mean per cluster; the convergence curve (per-iteration
    mean squared distance) is the output. Deterministic end to end: seeds
    are the first {LLOYD_K} vec_ids, the per-vector ARGMIN compares the
    1e-6-quantized squared distance (BIGINT) rather than the raw double —
    raw-d2 comparison relied on bit-identical sequential FP across
    engines, which an FMA/vectorization change could flip, cascading
    through every later iteration (round-10 ADVICE item 4; ties still
    break on lowest cell) — and BOTH cross-partition reductions — the
    inertia sum (over the SAME quantized qd2 the argmin ranked) and the
    centroid component sums — are BIGINT, so partial-agg order cannot
    move a bit.

    Oracle-backed since round 10 (was rows-only, "DuckDB would need the
    same loop"): DuckDB runs the loop UNROLLED — {LLOYD_ITERS}
    assignment/update CTE rounds (the hook+jump CC precedent from the
    leakage-audit oracle, applied to Lloyd) — and every iteration's
    inertia and cell count hash-match. With this upgrade every remaining
    rows-only query is rows-only for an engine-fundamental reason
    (MLlib, BLAS/LAPACK, HLL/KLL sketches, xxhash64 scale paths, sampleBy
    RNG, stub decoders), not expressibility. MLlib's KMeans
    (build_ivf_index) remains the production trainer; this is the
    engine-level form that scales each step as ordinary joins/aggs —
    corpus × K distance rows per iteration, centroid frame always K
    rows."""
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
    qd2 = F.round(dist2 * _LLOYD_SCALE).cast("long")
    curve = []
    for it in range(1, LLOYD_ITERS + 1):
        scored = emb.crossJoin(F.broadcast(cent)).select(
            "vec_id", "v", F.struct(qd2.alias("qd2"), F.col("cell")).alias("dc")
        )
        assigned = scored.groupBy("vec_id").agg(
            F.min("dc").alias("best"), F.first("v").alias("v")
        ).localCheckpoint(eager=False)  # one materialization for stats + update
        stats = assigned.agg(
            F.sum("best.qd2").alias("s"),
            F.count("*").alias("n"),
            F.count_distinct("best.cell").alias("n_cells"),
        ).collect()[0]
        # Identical BIGINTs divided by an identical double on both engines
        # → bit-identical inertia; no cross-engine rounding step needed.
        curve.append(
            (it, stats.s / (stats.n * float(_LLOYD_SCALE)), int(stats.n_cells))
        )
        cent = (
            assigned.select(
                F.col("best.cell").alias("cell"), F.posexplode("v").alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.round(F.col("val") * _LLOYD_SCALE).cast("long")).alias("cq"),
                F.count("*").alias("cn"),
            )
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "pos",
                            (F.col("cq") / (F.col("cn") * float(_LLOYD_SCALE))).alias("m"),
                        )
                    )
                ).alias("pm")
            )
            .select(
                "cell", F.transform(F.col("pm"), lambda s: s["m"]).alias("c")
            )
            .localCheckpoint(eager=False)
        )
    return spark.createDataFrame(
        curve, "iteration int, inertia double, n_cells long"
    )


# --- SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication", arXiv:2303.09540) -----------
# Cell count: K = floor(sqrt(n)) — the balanced blocking rule. Assignment
# costs O(n·K) folds and within-cell pruning costs O(n · n/K) pairs;
# K = √n equalizes them at O(n^1.5), the optimum for this two-stage
# shape (round-11 review finding: the first-cut K = n/32 kept pruning
# linear but silently moved the quadratic term into an O(n²/32)
# assignment and an O(n)-sized single-row codebook). floor(sqrt(·)) is
# engine-exact below 2^52: IEEE sqrt is correctly rounded, and for
# k < 2^26 the nearest double to sqrt(k²−1) is still < k, so Python's
# isqrt and SQL FLOOR(SQRT(·)) agree on every integer in range.
# Codebook ceiling: K clamped so the one-row broadcast codebook stays
# broadcast-sized (65 536 cells × 65 doubles ≈ 34 MB) — binds only past
# n ≈ 4·10⁹ vectors per run.
SEMDEDUP_MAX_CELLS = 65_536
# Cosine threshold above which two same-cell vectors are semantic
# duplicates (compared on the 6-dp ROUNDED cosine on both engines).
SEMDEDUP_TAU = 0.3

# The assignment prefix (corpus → deterministic adaptive-K codebook →
# per-vector argmax cell) is shared between the keep/drop decision oracle
# (semdedup_keep) and the τ-sweep scorecard oracle (semdedup_tau_curve) —
# one definition so the assignment convention cannot drift between the
# operator and its operating-point report (the _gram_hash_frame precedent
# from the span tier, applied to SQL).
_SEMDEDUP_ASSIGN_CTES = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS MATERIALIZED (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ), kk AS (
      SELECT GREATEST(2, LEAST({SEMDEDUP_MAX_CELLS},
                               CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT))) AS k
      FROM n
    ), code AS MATERIALIZED (
      -- adaptive-K deterministic codebook: rank by (md5(vec_id), vec_id),
      -- keep the first k — ROW_NUMBER <= scalar subquery instead of a
      -- LIMIT (DuckDB 1.0 won't take a subquery LIMIT)
      SELECT rk AS cell, v AS cv, nrm AS cnrm FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                  vec_id) AS rk, v, nrm
        FROM n) WHERE rk <= (SELECT k FROM kk)
    ), assign AS MATERIALIZED (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT n.vec_id, n.v, n.nrm, code.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY ROUND(list_dot_product(n.v, code.cv)
                                / (n.nrm * code.cnrm), 6) DESC, code.cell
               ) AS rn
        FROM n CROSS JOIN code) WHERE rn = 1
    )"""

_SEMDEDUP_ORACLE = _SEMDEDUP_ASSIGN_CTES + f"""
    SELECT a.vec_id, CAST(a.cell AS INT) AS cell,
           CAST(COUNT(b.vec_id) AS BIGINT) AS n_dups_before,
           COUNT(b.vec_id) = 0 AS kept
    FROM assign a LEFT JOIN assign b
      ON a.cell = b.cell AND b.vec_id < a.vec_id
     AND ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
           >= {SEMDEDUP_TAU}
    GROUP BY a.vec_id, a.cell
"""


@query(
    "semdedup_keep",
    oracle=_SEMDEDUP_ORACLE,
    tags=("similarity", "dedup-semantic", "ann-ivf"),
)
def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: corpus-WIDE semantic deduplication — cluster the embedding
    space, then inside each cluster drop every vector that has a
    same-cell predecessor above cosine {SEMDEDUP_TAU} (keep-first on
    vec_id, the repo's dedup convention; the paper keeps the
    lowest-centroid-similarity member — same set size, different
    representative). Output is the full per-vector decision frame:
    (vec_id, cell, n_dups_before, kept).

    This is the scale path :func:`..similarity.embedding_neardup`'s
    literal-bounded all-pairs form points at: clustering bounds the
    quadratic term. K adapts as ``floor(sqrt(n))``, clamped to
    [2, {SEMDEDUP_MAX_CELLS}] — the balanced blocking rule: assignment
    is O(n·K) in-row folds, within-cell pruning is O(n·n/K) pairs, and
    K = √n equalizes both at O(n^1.5) with a √n-sized (always
    broadcastable) codebook. SCALE ENVELOPE, stated honestly (round-11
    review finding replaced the first-cut K = n/32, whose assignment was
    O(n²/32) with an O(n) single-row codebook): n^1.5 exact work is the
    paper's own per-cluster exact regime, tractable to ~10⁸-10⁹ vectors
    distributed; beyond that the whole-corpus production path is
    :func:`build_ivf_index` (MLlib, multi-level cells) + the cell id as
    a write-time partition column (the self-join becomes
    partition-local — MEASURED in round 12: the cell-bucketed plan has
    ZERO cell Exchanges, prune-only wall 1.7-1.9× better at small n and
    parity at 200k vectors on local[32], where loopback shuffle is
    cheap — the removed term is cross-NODE network, the one a single
    host cannot price; SCALE.md round-12 box,
    ``scripts/scale_experiment.py --semdedup``) +
    :func:`..buckets.bounded_bucket_pairs` as the hot-cell degrade — all
    in-repo; they are not used here so the oracle stays the exact
    algorithm. The codebook is the deterministic md5
    ranking (TakeOrdered + one-row collect_list, the :func:`ivf_knn`
    machinery), assignment is the zero-shuffle in-row argmax over the
    broadcast codebook, and the within-cell comparison is an equi-join
    on cell — hash-partitioned, no nested loop. ONE embeddings scan
    feeds codebook, assignment, and both join sides (lazy
    localCheckpoint pins); the assigned frame is pinned so the a/b
    branches read one materialization. Residual (ADVICE r11): the
    rounded-cosine argmax is exact-integer only AFTER identical rounding —
    a ULP divergence between the engines' raw cosine folds landing at a
    half-integer of cos·10⁶ flips one cell assignment (the accepted
    round-before-compare residual; see :func:`_lloyd_assign_sql`)."""
    # fan_out: the K-cell argmax assignment is an in-row fold over this
    # scan; single-row-group serializes it (measured 1.03 → 0.71 s at
    # sf0.1/32, tables.py).
    e = load_table(spark, sf_dir, "embeddings", fan_out=True)
    assigned = semdedup_assigned_frame(e)
    return semdedup_prune_frame(assigned, assigned)


def semdedup_assigned_frame(e: DataFrame) -> DataFrame:
    """The SemDeDup assignment stage as its own frame: ``(vec_id, v, nrm,
    cell)``, pinned (lazy localCheckpoint). Extracted from
    :func:`semdedup_keep` (plan unchanged — pure function extraction) so
    the scale probe (``scripts/scale_experiment.py --semdedup``) can A/B
    the production write-time-cell-partitioning path against the
    registered in-memory shuffle-join form over the SAME assignment."""
    import math

    k = max(2, min(SEMDEDUP_MAX_CELLS, math.isqrt(e.count())))
    staged = (
        e.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
        .withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
        .localCheckpoint(eager=False)
    )
    cb = deterministic_codebook_frame(staged, k)
    scored_col = F.transform(
        F.col("cb"),
        lambda x: F.struct(
            F.round(
                dot(F.col("v"), x["cv"]) / (F.col("nrm") * x["cnrm"]), 6
            ).alias("c"),
            (-x["cell"]).alias("negcell"),
        ),
    )
    return (
        staged.crossJoin(F.broadcast(cb))
        .select(
            "vec_id",
            "v",
            "nrm",
            (-F.array_max(scored_col)["negcell"]).cast("int").alias("cell"),
        )
        .localCheckpoint(eager=False)  # one frame for both join sides
    )


def semdedup_prune_frame(a_src: DataFrame, b_src: DataFrame) -> DataFrame:
    """The SemDeDup within-cell pruning stage: keep-first rollup over two
    readings of the assignment frame (both args are the SAME pinned frame
    in the registered query; the scale probe passes two readings of a
    cell-bucketed TABLE instead, making the equi-join shuffle-free)."""
    a = a_src.select(
        "vec_id", "cell", F.col("v").alias("av"), F.col("nrm").alias("an")
    )
    b = b_src.select(
        F.col("vec_id").alias("b_vec_id"),
        F.col("cell").alias("b_cell"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    cos6 = F.round(dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 6)
    hits = a.join(
        b,
        (F.col("cell") == F.col("b_cell"))
        & (F.col("b_vec_id") < F.col("vec_id"))
        & (cos6 >= SEMDEDUP_TAU),
        "left",
    )
    return hits.groupBy("vec_id", "cell").agg(
        F.count("b_vec_id").cast("long").alias("n_dups_before"),
        (F.count("b_vec_id") == 0).alias("kept"),
    )


# --- SemDeDup τ operating-point scorecard --------------------------------
# The τ grid: 0.1 … 0.9 in steps of 0.1 (integer tau10 = 1..9 so the grid
# itself is exact; the emitted tau column is CAST(tau10/10 AS DOUBLE) with
# identical literals on both engines).
SEMDEDUP_TAU_GRID = tuple(range(1, 10))

_TAU_CASES_SQL = ",\n             ".join(
    f"SUM(CASE WHEN mx IS NULL OR mx < CAST({t} AS DOUBLE) / 10 "
    f"THEN 1 ELSE 0 END) AS k{t}"
    for t in SEMDEDUP_TAU_GRID
)
_TAU_UNION_SQL = "\n    UNION ALL ".join(
    f"SELECT CAST({t} AS DOUBLE) / 10 AS tau, k{t} AS n_kept, n_total FROM agg"
    for t in SEMDEDUP_TAU_GRID
)

_SEMDEDUP_TAU_ORACLE = _SEMDEDUP_ASSIGN_CTES + f""",
    mx AS MATERIALIZED (
      SELECT a.vec_id,
             MAX(ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6))
               AS mx
      FROM assign a LEFT JOIN assign b
        ON a.cell = b.cell AND b.vec_id < a.vec_id
      GROUP BY a.vec_id
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
             {_TAU_CASES_SQL}
      FROM mx
    )
    SELECT tau, CAST(n_kept AS BIGINT) AS n_kept, n_total,
           n_kept / n_total AS frac_kept
    FROM ({_TAU_UNION_SQL})
"""


@query(
    "semdedup_tau_curve",
    oracle=_SEMDEDUP_TAU_ORACLE,
    tags=("similarity", "dedup-semantic", "scorecard"),
)
def semdedup_tau_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup OPERATING-POINT scorecard: for every threshold τ in
    {0.1 … 0.9}, how much of the corpus survives keep-first semantic
    dedup at that τ — the curve a practitioner reads to pick
    ``SEMDEDUP_TAU`` (Abbas et al. 2023 sweep ~0.1-0.9 per fig. 3 before
    fixing their ε). Completes the scorecard convention for the semantic
    tier: ``ann_grid_report``/``minhash_calibration``/
    ``crossdoc_span_profile`` select operating points for the ANN, MinHash
    and span tiers; this one does it for :func:`semdedup_keep`.

    ONE extra reduction on top of the semdedup pair pass, not 9 runs: a
    vector is kept at τ iff it has NO same-cell predecessor with rounded
    cosine ≥ τ, i.e. iff ``max_pred_cos < τ`` (or no predecessor at all) —
    so the per-vector MAX predecessor cosine (computed once over the same
    O(n·n/K) banded pair set the keep/drop decision scans, same
    :func:`semdedup_assigned_frame` pins, same √n broadcast codebook)
    determines its fate at EVERY τ simultaneously. The 9-point curve is
    then a single 1-row conditional aggregate unpivoted via ``stack`` —
    zero additional shuffles, so the scorecard costs the same as the
    operator it tunes at any corpus size. Counts are exact BIGINTs on both
    engines; ``frac_kept`` divides the identical integers. Same
    round-before-compare residual as :func:`semdedup_keep` (the rounded
    cosine at a ULP half-integer boundary)."""
    e = load_table(spark, sf_dir, "embeddings")
    assigned = semdedup_assigned_frame(e)
    a = assigned.select(
        "vec_id", "cell", F.col("v").alias("av"), F.col("nrm").alias("an")
    )
    b = assigned.select(
        F.col("vec_id").alias("b_vec_id"),
        F.col("cell").alias("b_cell"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    cos6 = F.round(
        dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 6
    )
    mx = (
        a.join(
            b,
            (F.col("cell") == F.col("b_cell"))
            & (F.col("b_vec_id") < F.col("vec_id")),
            "left",
        )
        .select("vec_id", cos6.alias("c6"))
        .groupBy("vec_id")
        .agg(F.max("c6").alias("mx"))
    )
    kept_at = [
        F.sum(
            F.when(
                F.col("mx").isNull()
                | (F.col("mx") < F.lit(t).cast("double") / 10),
                1,
            ).otherwise(0)
        ).alias(f"k{t}")
        for t in SEMDEDUP_TAU_GRID
    ]
    agg = mx.agg(F.count("*").cast("long").alias("n_total"), *kept_at)
    stack_args = ", ".join(
        f"CAST({t} AS DOUBLE) / 10, k{t}" for t in SEMDEDUP_TAU_GRID
    )
    return agg.selectExpr(
        f"stack({len(SEMDEDUP_TAU_GRID)}, {stack_args}) AS (tau, n_kept)",
        "n_total",
    ).select(
        "tau",
        F.col("n_kept").cast("long").alias("n_kept"),
        "n_total",
        (F.col("n_kept") / F.col("n_total")).alias("frac_kept"),
    )


# --- Greedy k-center coreset (Gonzalez farthest-point traversal) ---------
# Number of centers PICKED after the fixed seed (vec_id 0): output rows are
# k = 2 … KC_PICKS + 1, one per pick, each carrying the covering radius of
# the PREVIOUS center set (the distance that forced the pick).
KC_PICKS = 6


def _kcenter_oracle(picks: int = KC_PICKS, dim: int | None = None) -> str:
    """Unrolled greedy k-center: state s{t} carries every vector's min
    QUANTIZED squared distance (``qd = ROUND(d2·10⁶)`` BIGINT, the Lloyd
    convention) to the centers chosen so far; pick p{t} is the argmax row
    (ties → lowest vec_id), excluded from later picks by an explicit
    NOT-IN chain (already-chosen centers sit at qd = 0 but an exact
    duplicate vector would too — exclusion must be by identity, not by
    distance)."""
    from .similarity import _EMB_DIMS

    dim = _EMB_DIMS if dim is None else dim
    dv = f"[s.v[i + 1] - c.cv[i + 1] FOR i IN range(0, {dim})]"
    dv0 = f"[n.v[i + 1] - c.cv[i + 1] FOR i IN range(0, {dim})]"
    parts = [
        f"""e AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), s1 AS MATERIALIZED (
      SELECT n.vec_id, n.v,
             CAST(ROUND(list_dot_product({dv0}, {dv0}) * {_LLOYD_SCALE})
                  AS BIGINT) AS qd
      FROM e n CROSS JOIN (SELECT v AS cv FROM e WHERE vec_id = 0) c
    )"""
    ]
    rows = []
    for t in range(2, picks + 2):
        excl = " AND ".join(
            ["vec_id <> 0"]
            + [f"vec_id NOT IN (SELECT vec_id FROM p{j})" for j in range(2, t)]
        )
        parts.append(
            f"""p{t} AS MATERIALIZED (
      SELECT vec_id, qd FROM s{t - 1}
      WHERE {excl}
      ORDER BY qd DESC, vec_id LIMIT 1
    )"""
        )
        rows.append(
            f"SELECT {t} AS k, vec_id AS center_vec_id,"
            f" qd / {_LLOYD_SCALE}.0 AS radius FROM p{t}"
        )
        if t < picks + 1:
            parts.append(
                f"""s{t} AS MATERIALIZED (
      SELECT s.vec_id, s.v,
             LEAST(s.qd,
                   CAST(ROUND(list_dot_product({dv}, {dv}) * {_LLOYD_SCALE})
                        AS BIGINT)) AS qd
      FROM s{t - 1} s CROSS JOIN
           (SELECT e.v AS cv FROM e JOIN p{t} USING (vec_id)) c
    )"""
            )
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + "\n    "
        + "\n    UNION ALL\n    ".join(rows)
    )


@query(
    "kcenter_coreset",
    oracle=_kcenter_oracle(),
    tags=("similarity", "coreset", "iterative"),
)
def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (Gonzalez farthest-point traversal) over the
    embedding corpus — the classic 2-approximation for diverse-subset /
    coreset selection (pick the point FARTHEST from everything chosen so
    far), the diversity-sampling counterpart to :func:`semdedup_keep`'s
    redundancy REMOVAL: dedup trims what is too close together, k-center
    picks what spans the space (public recipe: Sener & Savarese 2018's
    core-set active learning, arXiv:1708.00489, uses exactly this greedy
    rule). Output: one row per pick — (k, chosen center, covering radius
    of the PREVIOUS k-1 centers, i.e. the max-min squared distance that
    forced the pick). The radius column is the k-center objective curve:
    non-increasing, and where it plateaus is the natural coreset size.

    Iterative-algorithm pattern (the :func:`kmeans_lloyd_curve` shape):
    per pick, ONE linear scan of the pinned state frame — a 1-row
    struct-MAX argmax reduction (qd first, then negated vec_id: ties
    break to the lowest id) and a narrow map over the broadcast 1-row
    new-center frame updating ``qd = LEAST(qd, qd2(v, new))``. The corpus
    NEVER shuffles: total work is O(K·n·dim) folds with K+1 one-row
    driver collects, and the state chain is pinned by lazy
    localCheckpoints exactly like Lloyd. Distances compare as
    1e-6-quantized BIGINTs on both engines (the argmax, the LEAST fold
    and the emitted radius all read the SAME qd — the
    :func:`_lloyd_assign_sql` rule, same round-before-compare residual).
    Already-chosen centers (qd = 0) are excluded by ID, not by distance,
    so an exact-duplicate corpus cannot re-pick a center."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )

    def qdist():
        d2 = F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.round(d2 * _LLOYD_SCALE).cast("long")

    seed = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("cv"))
    state = (
        emb.crossJoin(F.broadcast(seed))
        .select("vec_id", "v", qdist().alias("qd"))
        .localCheckpoint(eager=False)
    )
    chosen = [0]
    rows = []
    for k in range(2, KC_PICKS + 2):
        best = (
            state.filter(~F.col("vec_id").isin(chosen))
            .agg(
                F.max(
                    F.struct(
                        F.col("qd"), (-F.col("vec_id")).alias("nid")
                    )
                ).alias("b")
            )
            .collect()[0]["b"]
        )
        if best is None:
            # Corpus exhausted (< KC_PICKS + 1 vectors, or no seed vec_id
            # 0 at all): stop picking — the oracle's p{k} CTE is empty and
            # emits no row for this and every later k, so the curve just
            # ends early on both engines.
            break
        cid = -best["nid"]
        rows.append((k, cid, best["qd"] / float(_LLOYD_SCALE)))
        chosen.append(cid)
        if k < KC_PICKS + 1:
            cv = state.filter(F.col("vec_id") == cid).select(
                F.col("v").alias("cv")
            )
            state = (
                state.crossJoin(F.broadcast(cv))
                .select(
                    "vec_id",
                    "v",
                    F.least(F.col("qd"), qdist()).alias("qd"),
                )
                .localCheckpoint(eager=False)
            )
    return spark.createDataFrame(
        rows, "k int, center_vec_id long, radius double"
    )


# --- IVF probe operating-point scorecard ----------------------------------
# n_probe grid for the recall sweep (max must stay <= N_CELLS).
PROBE_GRID = (1, 2, 4, 8)


def _ivf_probe_recall_oracle(grid: tuple[int, ...] = PROBE_GRID) -> str:
    """Exact top-k from brute force, probed candidates tagged with their
    cell's probe rank ``pr``, then one ranked top-k + intersection count
    per grid point — every count BIGINT, recall a division of identical
    integers."""
    widest = max(grid)
    per_p = "\n    UNION ALL ".join(
        f"""SELECT {p} AS n_probe, m.n_matched, exn.n_exact,
           m.n_matched / exn.n_exact AS recall
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_matched
          FROM (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY cosine DESC,
                                                     neighbor_id) AS rn
                  FROM pairs WHERE pr <= {p}) WHERE rn <= {TOP_K}) t
          JOIN exact USING (query_id, neighbor_id)) m CROSS JOIN exn"""
        for p in grid
    )
    return (
        _IVF_BASE_CTES
        + f""", exact AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY ROUND(list_dot_product(q.v, c.v)
                                / (q.nrm * c.nrm), 6) DESC, c.vec_id
               ) AS rn
        FROM n q JOIN n c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}) WHERE rn <= {TOP_K}
    ), probedw AS (
      SELECT vec_id AS query_id, v AS qv, nrm AS qn, cell, rn AS pr FROM (
        SELECT n.vec_id, n.v, n.nrm, code.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY ROUND(list_dot_product(n.v, code.cv)
                                / (n.nrm * code.cnrm), 6) DESC, code.cell
               ) AS rn
        FROM n CROSS JOIN code WHERE n.vec_id < {N_QUERIES})
      WHERE rn <= {widest}
    ), pairs AS MATERIALIZED (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             ROUND(list_dot_product(p.qv, a.v) / (p.qn * a.nrm), 6)
               AS cosine, p.pr
      FROM probedw p JOIN assign a
        ON a.cell = p.cell AND a.vec_id <> p.query_id
    ), exn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact
    )
    {per_p}"""
    )


@query(
    "ivf_probe_recall",
    oracle=_ivf_probe_recall_oracle(),
    tags=("similarity", "ann-ivf", "scorecard"),
)
def ivf_probe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF tier's operating-point scorecard: recall@{TOP_K} of the
    probed search vs exact brute force as a function of ``n_probe`` over
    the grid {PROBE_GRID} — the knob an IVF deployment actually tunes
    (more probes = more candidates scanned = higher recall; the curve
    shows where it saturates). Completes the scorecard family across
    every similarity tier: ``ann_recall_report``/``ann_grid_report``
    (banded LSH), ``minhash_calibration`` (MinHash banding),
    ``crossdoc_span_profile`` (span length), ``semdedup_tau_curve``
    (semantic-dedup τ) — IVF probe depth was the one tuning knob without
    a measured curve.

    ONE candidate pass serves every grid point: the query slice explodes
    its top-``max(grid)`` cells WITH the probe rank ``pr`` attached
    (posexplode over the same in-row sorted score array
    :func:`ivf_knn` probes), so the candidate set under ``n_probe = p``
    is exactly the pairs with ``pr <= p`` — a filter, not a re-join.
    Per grid point the top-k re-rank and the intersection with the exact
    set are windows/joins over that single pinned pair frame (bounded:
    |queries| × widest-probe cells — never corpus × corpus). The exact
    side is the {N_QUERIES}-query brute-force top-{TOP_K} (broadcast
    queries, one corpus scan). Rankings on BOTH sides use the rounded
    cosine with neighbor-id tie-break (the cross-engine 1-ulp rule);
    counts are BIGINTs, recall divides identical integers. Recall is
    monotone in ``n_probe`` by construction (candidate sets nest), which
    the unit test pins."""
    e = load_table(spark, sf_dir, "embeddings")
    staged = (
        e.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
        .withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
        .localCheckpoint(eager=False)  # codebook + corpus + query slice
    )
    cb = deterministic_codebook_frame(staged)
    scored_col = F.transform(
        F.col("cb"),
        lambda x: F.struct(
            F.round(
                dot(F.col("v"), x["cv"]) / (F.col("nrm") * x["cnrm"]), 6
            ).alias("c"),
            (-x["cell"]).alias("negcell"),
        ),
    )
    scored = staged.crossJoin(F.broadcast(cb)).select(
        "vec_id", "v", "nrm", scored_col.alias("scored")
    )
    assigned = scored.select(
        "vec_id",
        "v",
        "nrm",
        (-F.array_max("scored")["negcell"]).cast("int").alias("cell"),
    )
    widest = max(PROBE_GRID)
    probed = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.posexplode(
                F.slice(F.reverse(F.array_sort("scored")), 1, widest)
            ).alias("pos", "p"),
        )
        .select(
            "query_id",
            "qv",
            "qn",
            (F.col("pos") + 1).alias("pr"),
            (-F.col("p")["negcell"]).cast("int").alias("cell"),
        )
    )
    pairs = (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
            ).alias("cosine"),
            "pr",
        )
        .localCheckpoint(eager=False)  # one pair pass for every grid point
    )
    q = staged.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    ex_pairs = (
        staged.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
            ).alias("cosine"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    exact = (
        ex_pairs.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)  # intersected by every grid point
    )
    exn = exact.agg(F.count("*").cast("long").alias("n_exact"))
    out = None
    for p in PROBE_GRID:
        topk_p = (
            pairs.filter(F.col("pr") <= p)
            .withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", "neighbor_id")
        )
        row = (
            topk_p.join(exact, ["query_id", "neighbor_id"])
            .agg(F.count("*").cast("long").alias("n_matched"))
            .crossJoin(exn)
            .select(
                F.lit(p).cast("int").alias("n_probe"),
                "n_matched",
                "n_exact",
                (F.col("n_matched") / F.col("n_exact")).alias("recall"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- IVF-PQ: coarse cells × product-quantized codes ------------------------
# The FAISS-standard composition for 10⁹+ vectors (Jegou et al. 2011 §V):
# the IVF codebook prunes the candidate set to n_probe cells, and within
# them ranking runs on PQ asymmetric distances against the resident
# codebook — the corpus stores only the cell id and PQ_M uint4 codes.
# Grid and conventions come verbatim from the two parents: N_CELLS/N_PROBE
# cells (ivf_knn), PQ_M×PQ_K subquantizer codebook + quantized-BIGINT
# per-subspace assignment + ROUND(·,6)/neighbor-id ranking (pq_adc_recall).


def _ivf_pq_oracle() -> str:
    from .similarity import _EMB_DIMS, PQ_K, PQ_M, PQ_SUB, QKNN_TOPKS

    cases = ",\n             ".join(
        f"SUM(CASE WHEN rne <= {k} AND rnq_raw <= {k} THEN 1 ELSE 0 END)"
        f" AS mr{k},\n"
        f"             SUM(CASE WHEN rne <= {k} AND rnq_res <= {k} THEN 1"
        f" ELSE 0 END) AS ms{k},\n"
        f"             SUM(CASE WHEN rne <= {k} THEN 1 ELSE 0 END) AS e{k}"
        for k in QKNN_TOPKS
    )
    union = "\n      UNION ALL ".join(
        [
            f"SELECT 'pq_raw' AS variant, {k} AS topk,"
            f" mr{k} AS n_matched, e{k} AS n_exact FROM agg"
            for k in QKNN_TOPKS
        ]
        + [
            f"SELECT 'pq_residual' AS variant, {k} AS topk,"
            f" ms{k} AS n_matched, e{k} AS n_exact FROM agg"
            for k in QKNN_TOPKS
        ]
    )
    return (
        _IVF_BASE_CTES
        + f""", pqcb AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                vec_id) AS cid, v AS cv
      FROM (SELECT vec_id, v FROM n
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {PQ_K})
    ), pq_assign AS (
      SELECT vec_id, m, cid FROM (
        SELECT a.vec_id, mm.m, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id, mm.m
                 ORDER BY CAST(ROUND(1000000 * list_dot_product(
                     [a.v[mm.m * {PQ_SUB} + i] - c.cv[mm.m * {PQ_SUB} + i]
                      FOR i IN range(1, {PQ_SUB} + 1)],
                     [a.v[mm.m * {PQ_SUB} + i] - c.cv[mm.m * {PQ_SUB} + i]
                      FOR i IN range(1, {PQ_SUB} + 1)])) AS BIGINT),
                   c.cid) AS rn
        FROM n a, UNNEST(range(0, {PQ_M})) AS mm(m), pqcb c
      ) WHERE rn = 1
    ), recon AS MATERIALIZED (
      SELECT a.vec_id,
             flatten(list(list_slice(c.cv, a.m * {PQ_SUB} + 1,
                                     (a.m + 1) * {PQ_SUB}) ORDER BY a.m))
               AS r
      FROM pq_assign a JOIN pqcb c USING (cid)
      GROUP BY a.vec_id
    ), cdim AS (
      -- per-(cell, dim) member sums in integer micro-units: a double SUM's
      -- fold order moves across partitions and engines (the LP_SCALE rule),
      -- an integer SUM is order-free — so the recentred centroid is
      -- bit-identical on both engines.
      SELECT a.cell, d.i,
             SUM(CAST(ROUND(1000000 * a.v[d.i]) AS BIGINT)) AS s,
             CAST(COUNT(*) AS BIGINT) AS nm
      FROM assign a, UNNEST(range(1, {_EMB_DIMS} + 1)) AS d(i)
      GROUP BY a.cell, d.i
    ), cmean AS MATERIALIZED (
      -- recentred cell centroid = member mean (the one-Lloyd-step coarse
      -- quantizer FAISS IVFADC trains; the md5 codebook only seeds the
      -- assignment)
      SELECT cell,
             list(CAST(s AS DOUBLE) / nm / 1000000.0 ORDER BY i) AS mv
      FROM cdim GROUP BY cell
    ), res AS MATERIALIZED (
      -- residual vs the recentred centroid (true IVFADC: the PQ codebook
      -- trains and encodes on residuals, not raw vectors)
      SELECT a.vec_id, a.cell, m.mv,
             [a.v[i] - m.mv[i] FOR i IN range(1, {_EMB_DIMS} + 1)] AS r
      FROM assign a JOIN cmean m USING (cell)
    ), rqcb AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                vec_id) AS cid, r AS cv
      FROM (SELECT vec_id, r FROM res
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {PQ_K})
    ), rq_assign AS (
      SELECT vec_id, m, cid FROM (
        SELECT a.vec_id, mm.m, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id, mm.m
                 ORDER BY CAST(ROUND(1000000 * list_dot_product(
                     [a.r[mm.m * {PQ_SUB} + i] - c.cv[mm.m * {PQ_SUB} + i]
                      FOR i IN range(1, {PQ_SUB} + 1)],
                     [a.r[mm.m * {PQ_SUB} + i] - c.cv[mm.m * {PQ_SUB} + i]
                      FOR i IN range(1, {PQ_SUB} + 1)])) AS BIGINT),
                   c.cid) AS rn
        FROM res a, UNNEST(range(0, {PQ_M})) AS mm(m), rqcb c
      ) WHERE rn = 1
    ), rrecon AS MATERIALIZED (
      SELECT a.vec_id,
             flatten(list(list_slice(c.cv, a.m * {PQ_SUB} + 1,
                                     (a.m + 1) * {PQ_SUB}) ORDER BY a.m))
               AS rr
      FROM rq_assign a JOIN rqcb c USING (cid)
      GROUP BY a.vec_id
    ), rfull AS MATERIALIZED (
      SELECT s.vec_id,
             [s.mv[i] + rc.rr[i] FOR i IN range(1, {_EMB_DIMS} + 1)]
               AS recon
      FROM rrecon rc JOIN res s ON s.vec_id = rc.vec_id
    ), probed AS (
      SELECT vec_id AS query_id, v AS qv, cell FROM (
        SELECT n.vec_id, n.v, code.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY ROUND(list_dot_product(n.v, code.cv)
                                / (n.nrm * code.cnrm), 6) DESC, code.cell
               ) AS rn
        FROM n CROSS JOIN code WHERE n.vec_id < {N_QUERIES})
      WHERE rn <= {N_PROBE}
    ), cand AS MATERIALIZED (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             ROUND(list_dot_product(p.qv, r.r), 6) AS adc_raw,
             ROUND(list_dot_product(p.qv, rf.recon), 6) AS adc_res
      FROM probed p
           JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
           JOIN recon r ON r.vec_id = a.vec_id
           JOIN rfull rf ON rf.vec_id = a.vec_id
    ), cd AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_raw DESC, neighbor_id)
               AS rnq_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_res DESC, neighbor_id)
               AS rnq_res
      FROM cand
    ), ex AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY ROUND(list_dot_product(q.v, c.v), 6) DESC,
                        c.vec_id) AS rne
      FROM n q JOIN n c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ), nc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand
    ), joined AS (
      SELECT e2.rne, c2.rnq_raw, c2.rnq_res
      FROM ex e2 LEFT JOIN cd c2 USING (query_id, neighbor_id)
    ), agg AS (
      SELECT {cases}
      FROM joined
    )
    SELECT variant, topk, CAST(n_matched AS BIGINT) AS n_matched,
           CAST(n_exact AS BIGINT) AS n_exact,
           n_matched / n_exact AS recall,
           n_candidates
    FROM ({union}) CROSS JOIN nc
"""
    )


@query(
    "ivf_pq_recall",
    oracle=_ivf_pq_oracle(),
    tags=("similarity", "ann-ivf", "quantization", "pq", "scorecard"),
)
def ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ end-to-end retrieval scorecard: recall@{1,{TOP_K}} of the
    composed index — IVF cell pruning (top-{N_PROBE} of {N_CELLS} cells per
    query) with PQ asymmetric-distance ranking inside the probed cells —
    against exact full-double max-inner-product search, plus the total
    candidate volume the pruning admitted, for BOTH PQ encodings side by
    side: ``pq_raw`` (codebook trained/encoded on raw vectors) and
    ``pq_residual`` (FAISS-standard IVFADC: trained/encoded on the
    residual vs the assigned cell centroid, reconstruction = centroid +
    decoded residual — round-13 verdict item 3; residuals concentrate
    around 0 so the same code budget spends its resolution where the
    in-cell variation actually lives, which is what a deployed composed
    index uses). This is the memory layout production ANN actually
    deploys at 10⁹+ vectors (cell id + {PQ_M} uint4 codes per vector ≈
    64× smaller than the floats): ``ivf_knn`` grades the pruning with
    exact distances, ``pq_adc_recall`` grades the quantization with no
    pruning; this grades what a user gets when the approximations stack
    — always ≤ either parent's recall, with n_candidates quantifying the
    scan saving that buys.

    Shape at 100 TB: both codebooks are one-row broadcast arrays; cell
    assignment AND the PQ reconstruction are in-row folds over them —
    the corpus-wide stage is shuffle-free and at deployment both collapse
    into write-time layout (cell = partition column, codes = stored
    column). Search touches only probed-cell members (cell-grain equi-join
    against the broadcast {N_QUERIES}×{N_PROBE} probe frame); the exact
    baseline is the standard bounded broadcast-query scan. All ranking
    conventions inherited: rounded-cosine probe order with cell tie-break,
    quantized-BIGINT subspace argmin, ROUND(·,6) + neighbor-id final
    ranks."""
    from .similarity import PQ_K, PQ_M, PQ_SUB, QKNN_TOPKS

    # fan_out (round 16): the whole checkpoint ladder below (staged → based
    # → staged2 → scored) inherits the scan's partitioning, so un-fanned it
    # ran as a chain of single-task stages — UI-REST attribution measured
    # ~2.8–3.5 s walls dominated by two 2.4 s one-task encode stages.
    e = load_table(spark, sf_dir, "embeddings", fan_out=True)
    staged = (
        e.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
        .withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
        .localCheckpoint(eager=False)  # codebooks + corpus + query slice
    )
    cb = deterministic_codebook_frame(staged)
    md5k = F.md5(F.col("vec_id").cast("string"))
    pqcb = (
        staged.select(md5k.alias("k"), "vec_id", "v")
        .orderBy("k", "vec_id")
        .limit(PQ_K)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("k", "vec_id", F.col("v").alias("cv")))
                ),
                lambda s, i: F.struct(
                    (i + 1).cast("int").alias("cid"), s["cv"].alias("cv")
                ),
            ).alias("pqcb")
        )
    )
    withcb = staged.crossJoin(F.broadcast(cb))

    # IVF side: rounded cosine to every cell centroid, staged as one array
    # (the ivf_knn fold — lexicographic array_max = highest cosine, lowest
    # cell via the negated cell id)
    scored_col = F.transform(
        F.col("cb"),
        lambda x: F.struct(
            F.round(
                dot(F.col("v"), x["cv"]) / (F.col("nrm") * x["cnrm"]), 6
            ).alias("c"),
            (-x["cell"]).alias("negcell"),
        ),
    )

    # Cell assignment FIRST (both variants need it; the residual variant
    # recentres each cell on its member mean). The pinned frames carry NO
    # codebook columns: a checkpoint MATERIALIZES its rows, and a per-row
    # copy of the 16×64 pqcb array is ~8 KB/row — ~1.6 GB of checkpoint
    # storage at the 100× probe's 200k vectors (measured as a 25× wall
    # regression before this slimming); the one-row codebooks crossJoin in
    # AFTER the pins, on the streaming side.
    based = withcb.select(
        "vec_id",
        "v",
        "nrm",
        scored_col.alias("scored"),
        (-F.array_max("scored")["negcell"]).cast("int").alias("cell"),
    ).localCheckpoint(eager=False)  # mean aggregate + residual join
    # Recentred cell centroid = member mean (the one-Lloyd-step coarse
    # quantizer FAISS IVFADC trains — the md5 codebook only seeds the
    # assignment; a SAMPLED vector as "centroid" makes residuals BIGGER
    # than the vectors on isotropic data, measured recall 0). Per-dim sums
    # in integer micro-units: a double SUM's fold order moves across
    # partitions and engines (the LP_SCALE rule), an integer SUM is
    # order-free, so the mean is bit-identical on both engines. The
    # (cell, dim) aggregate is N_CELLS×dims rows — map-side combined,
    # shuffle-free at any corpus size; the mean join back is cell-grain
    # equi with a 16-row side, left to AQE.
    dim_sums = (
        based.select("cell", F.posexplode("v").alias("i", "comp"))
        .groupBy("cell", "i")
        .agg(
            F.sum(F.round(F.col("comp") * 1_000_000).cast("long")).alias("s"),
            F.count("*").alias("nm"),
        )
    )
    means = dim_sums.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "s", "nm"))),
            lambda t: t["s"].cast("double") / t["nm"] / 1_000_000.0,
        ).alias("mv")
    )
    # residual vs the recentred centroid — the true-IVFADC encode input;
    # pinned because it feeds BOTH the residual codebook and the encode.
    staged2 = (
        based.join(means, "cell")
        .select(
            "*", F.zip_with("v", "mv", lambda a, b: a - b).alias("res")
        )
        .localCheckpoint(eager=False)
    )

    # Residual PQ codebook: the SAME md5-deterministic selection as pqcb,
    # but over the residuals (FAISS-standard IVFADC trains sub-quantizers
    # on residuals — round-13 verdict item 3).
    rqcb = (
        staged2.select(md5k.alias("k"), "vec_id", "res")
        .orderBy("k", "vec_id")
        .limit(PQ_K)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("k", "vec_id", F.col("res").alias("cv"))
                    )
                ),
                lambda s, i: F.struct(
                    (i + 1).cast("int").alias("cid"), s["cv"].alias("cv")
                ),
            ).alias("rqcb")
        )
    )
    enc = staged2.crossJoin(F.broadcast(pqcb)).crossJoin(F.broadcast(rqcb))

    # PQ side: per-subspace argmin over a broadcast codebook, quantized-
    # BIGINT distances (the pq_adc_recall fold), reconstruction in-row —
    # parameterized over (source vector, codebook) so the raw and residual
    # variants share one implementation.
    def _sub_qd2(src, cv, m):
        diffs = F.transform(
            F.sequence(F.lit(0), F.lit(PQ_SUB - 1)),
            lambda i: (
                F.get(F.col(src), m * PQ_SUB + i) - F.get(cv, m * PQ_SUB + i)
            ),
        )
        d2 = F.aggregate(
            F.transform(diffs, lambda d: d * d),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.round(d2 * 1_000_000).cast("long")

    def _best_slice(src, book, m):
        best = F.array_min(
            F.transform(
                F.col(book),
                lambda c: F.struct(
                    _sub_qd2(src, c["cv"], m).alias("qd2"), c["cid"].alias("cid")
                ),
            )
        )
        return F.slice(
            F.element_at(F.col(book), best["cid"])["cv"],
            m * PQ_SUB + 1,
            F.lit(PQ_SUB),
        )

    recon_raw = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(PQ_M - 1)),
            lambda m: _best_slice("v", "pqcb", m),
        )
    )
    recon_res = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(PQ_M - 1)),
            lambda m: _best_slice("res", "rqcb", m),
        )
    )
    scored = enc.select(
        "vec_id",
        "v",
        "nrm",
        "scored",
        "cell",
        recon_raw.alias("r"),
        # residual variant reconstructs recentred centroid + decoded residual
        F.zip_with("mv", recon_res, lambda a, b: a + b).alias("rv"),
    ).localCheckpoint(eager=False)
    # ^ pin (round 16): `scored` feeds BOTH the candidate join's stream side
    # (`assigned`) and the broadcast probe side (`probed`); without the pin
    # the PQ encode folds (2 variants × PQ_M subspaces × PQ_K codewords per
    # row — the query's dominant per-row compute, 2.4 s/run at sf0.1) ran
    # once per branch. Same slimming rule as the other pins: no codebook
    # columns ride the checkpoint — only the per-row derived r/rv.
    assigned = scored.select("vec_id", "cell", "r", "rv")
    probed = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode(
                F.slice(F.reverse(F.array_sort("scored")), 1, N_PROBE)
            ).alias("p"),
        )
        .select(
            "query_id", "qv", (-F.col("p")["negcell"]).cast("int").alias("cell")
        )
    )
    cand = (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot(F.col("qv"), F.col("r")), 6).alias("adc_raw"),
            F.round(dot(F.col("qv"), F.col("rv")), 6).alias("adc_res"),
        )
        .localCheckpoint(eager=False)  # ranked side + candidate count
    )
    w_raw = Window.partitionBy("query_id").orderBy(
        F.desc("adc_raw"), F.asc("neighbor_id")
    )
    w_res = Window.partitionBy("query_id").orderBy(
        F.desc("adc_res"), F.asc("neighbor_id")
    )
    cd = cand.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w_raw).alias("rnq_raw"),
        F.row_number().over(w_res).alias("rnq_res"),
    )
    qf = staged.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    we = Window.partitionBy("query_id").orderBy(
        F.desc("xdot"), F.asc("neighbor_id")
    )
    ex = (
        staged.crossJoin(F.broadcast(qf))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot(F.col("qv"), F.col("v")), 6).alias("xdot"),
        )
        .select("query_id", "neighbor_id", F.row_number().over(we).alias("rne"))
    )
    joined = ex.join(cd, ["query_id", "neighbor_id"], "left")
    cases = []
    for k in QKNN_TOPKS:
        cases.append(
            F.sum(
                F.when(
                    (F.col("rne") <= k) & (F.col("rnq_raw") <= k), 1
                ).otherwise(0)
            ).alias(f"mr{k}")
        )
        cases.append(
            F.sum(
                F.when(
                    (F.col("rne") <= k) & (F.col("rnq_res") <= k), 1
                ).otherwise(0)
            ).alias(f"ms{k}")
        )
        cases.append(
            F.sum(F.when(F.col("rne") <= k, 1).otherwise(0)).alias(f"e{k}")
        )
    agg = joined.agg(*cases)
    nc = cand.agg(F.count("*").cast("long").alias("n_candidates"))
    stack_args = ", ".join(
        [f"'pq_raw', {k}, mr{k}, e{k}" for k in QKNN_TOPKS]
        + [f"'pq_residual', {k}, ms{k}, e{k}" for k in QKNN_TOPKS]
    )
    return (
        agg.selectExpr(
            f"stack({2 * len(QKNN_TOPKS)}, {stack_args})"
            " AS (variant, topk, n_matched, n_exact)"
        )
        .crossJoin(F.broadcast(nc))
        .select(
            "variant",
            F.col("topk").cast("int").alias("topk"),
            F.col("n_matched").cast("long").alias("n_matched"),
            F.col("n_exact").cast("long").alias("n_exact"),
            (F.col("n_matched") / F.col("n_exact")).alias("recall"),
            "n_candidates",
        )
    )
