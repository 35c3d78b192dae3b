"""Bounded bucket self-joins for LSH candidate generation.

A bucket self-join is quadratic in bucket size: on a degenerate corpus (many
near-identical documents) every row lands in one bucket and the "linear" LSH
path silently becomes all-pairs — the hot-bucket blowup flagged in the round-1
verdict. :func:`bounded_bucket_pairs` caps that worst case:

  * buckets with at most ``cap`` members emit all pairs (exact behavior, the
    overwhelmingly common case on real corpora);
  * larger buckets emit star pairs — every member paired with the bucket's
    minimum id — so a bucket of m rows contributes m-1 candidates instead of
    m·(m-1)/2, keeping total candidates O(n·cap). Star pairs keep a member
    connected to the cluster only while it survives any downstream distance
    filter AGAINST THE HUB; callers that filter (simhash's hamming ≤ 3)
    should also pass ``chain_cols`` so identical-signature runs stay
    connected independently of hub distance (see the function docstring).

The size window, the hub window, and the self-join all partition on the same
bucket key, so AQE reuses one exchange — no extra shuffle versus the unbounded
join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Default worst-case bucket width. 64 members = 2,016 pairs per bucket max;
# real near-dup buckets are far smaller, degenerate ones switch to star form.
MAX_BUCKET_MEMBERS = 64


def bounded_bucket_pairs(
    members: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    cap: int = MAX_BUCKET_MEMBERS,
    keep_bucket_cols: bool = False,
    payload_cols: list[str] | None = None,
    chain_cols: list[str] | None = None,
) -> DataFrame:
    """Candidate pairs ``(id1, id2)`` with ``id1 < id2`` per bucket, bounded.

    ``members`` must have one row per (bucket, id); ``bucket_cols`` is the
    bucket key (e.g. ``["bucket"]`` or ``["band", "bucket"]``).

    ``payload_cols`` threads per-member columns through to the pair output as
    ``{col}1`` / ``{col}2`` (e.g. the signature each side needs for a hamming
    verify) — on the star path the hub's payload comes from a ``min_by`` over
    the same bucket window, so no extra join or shuffle is introduced.

    ``chain_cols`` (optional) strengthens the DEGRADED path: in an
    oversized bucket the star form alone emits only (hub, member) pairs, so
    a downstream similarity filter (e.g. hamming ≤ 3) disconnects every
    member whose distance TO THE HUB exceeds the threshold even when it has
    true near-neighbors in the bucket (round-8 review finding). With
    ``chain_cols`` set, the oversized bucket ALSO emits adjacent pairs in
    ``(*chain_cols, id)`` order — members with IDENTICAL chain values (the
    boilerplate-collapse case that creates oversized buckets in the first
    place) become consecutive and survive any distance filter at distance
    0, staying fully connected as a chain regardless of hub distance.
    Output stays O(2·size) per oversized bucket; duplicates between star
    and chain pairs are the caller's ``distinct()`` to fold, like repeated
    band collisions.

    The sized frame is pinned with a lazy ``localCheckpoint``: it feeds
    THREE plan branches (both sides of the small-bucket self-join and the
    star branch), and without the pin each branch re-runs the upstream
    bucket derivation AND the size window — measured at sf0.1 as the
    dominant cost of every LSH candidate query (simhash 1.87 → 0.72 s,
    minhash 0.58 → 0.11 s, embedding-LSH 0.49 → 0.08 s). Storage is one
    materialization of the (bucket, id, payload) rows — the same order of
    magnitude the branch shuffles were already paying three times.

    Fault-tolerance tradeoff (applies to EVERY lazy-localCheckpoint pin in
    this repo): localCheckpoint blocks live only on their executor,
    unreplicated — losing an executor (or a dynamic-allocation downscale)
    fails the job instead of recomputing, since the truncated lineage
    cannot be replayed. Fine on local[*] and static on-demand clusters;
    on a cluster with preemptible executors or dynamic allocation, swap
    the pin for ``persist(StorageLevel.DISK_ONLY_2)`` (replicated, lineage
    kept) or a reliable ``checkpoint()`` to HDFS/object storage. See
    docs/SCALE.md "Pinned shared frames".
    """
    payload_cols = payload_cols or []
    w = Window.partitionBy(*bucket_cols)
    enriched = members.withColumn("_bsize", F.count("*").over(w))
    if chain_cols:
        # Compute the chain predecessors BEFORE the pin: this window shares
        # the size window's bucket-key partitioning, so both run off ONE
        # exchange and the lag columns are materialized into the pinned
        # frame — the chain branch below is then a pure filter+select with
        # no exchange of its own (keeps the candidate pipelines at their
        # 2-exchange budget, tests/test_plans.py).
        cw = w.orderBy(*[F.col(c) for c in chain_cols], F.col(id_col))
        enriched = enriched.withColumn("_prev_id", F.lag(id_col).over(cw))
        for c in payload_cols:
            enriched = enriched.withColumn(f"_prev_{c}", F.lag(c).over(cw))
    sized = enriched.localCheckpoint(eager=False)

    small = sized.filter(F.col("_bsize") <= cap).select(
        *bucket_cols, id_col, *payload_cols
    )
    a, b = small.alias("a"), small.alias("b")
    same_bucket = reduce(
        lambda x, y: x & y, [F.col(f"a.{c}") == F.col(f"b.{c}") for c in bucket_cols]
    )
    out_cols = (
        [F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2")]
        + [F.col(f"a.{c}").alias(f"{c}1") for c in payload_cols]
        + [F.col(f"b.{c}").alias(f"{c}2") for c in payload_cols]
        + ([F.col(f"a.{c}") for c in bucket_cols] if keep_bucket_cols else [])
    )
    small_pairs = a.join(
        b, same_bucket & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    ).select(*out_cols)

    hub = F.min(id_col).over(w)
    big = sized.filter(F.col("_bsize") > cap).withColumn("_hub", hub)
    for c in payload_cols:
        big = big.withColumn(f"_hub_{c}", F.min_by(c, id_col).over(w))
    big_out = (
        [F.col("_hub").alias("id1"), F.col(id_col).alias("id2")]
        + [F.col(f"_hub_{c}").alias(f"{c}1") for c in payload_cols]
        + [F.col(c).alias(f"{c}2") for c in payload_cols]
        + ([F.col(c) for c in bucket_cols] if keep_bucket_cols else [])
    )
    big_pairs = (
        big.filter(F.col(id_col) != F.col("_hub")).select(*big_out)
    )
    out = small_pairs.unionByName(big_pairs)

    if chain_cols:
        chain = sized.filter(F.col("_bsize") > cap)
        swap = F.col("_prev_id") > F.col(id_col)
        chain_out = (
            [
                F.when(swap, F.col(id_col)).otherwise(F.col("_prev_id")).alias("id1"),
                F.when(swap, F.col("_prev_id")).otherwise(F.col(id_col)).alias("id2"),
            ]
            + [
                F.when(swap, F.col(c)).otherwise(F.col(f"_prev_{c}")).alias(f"{c}1")
                for c in payload_cols
            ]
            + [
                F.when(swap, F.col(f"_prev_{c}")).otherwise(F.col(c)).alias(f"{c}2")
                for c in payload_cols
            ]
            + ([F.col(c) for c in bucket_cols] if keep_bucket_cols else [])
        )
        chain_pairs = chain.filter(F.col("_prev_id").isNotNull()).select(*chain_out)
        out = out.unionByName(chain_pairs)
    return out
