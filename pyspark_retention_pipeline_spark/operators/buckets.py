"""Bounded bucket self-joins for LSH candidate generation.

A bucket self-join is quadratic in bucket size: on a degenerate corpus (many
near-identical documents) every row lands in one bucket and the "linear" LSH
path silently becomes all-pairs — the hot-bucket blowup flagged in the round-1
verdict. :func:`bounded_bucket_pairs` caps that worst case:

  * buckets with at most ``cap`` members emit all pairs (exact behavior, the
    overwhelmingly common case on real corpora);
  * larger buckets emit star pairs — every member paired with the bucket's
    minimum id — so a bucket of m rows contributes m-1 candidates instead of
    m·(m-1)/2, keeping total candidates O(n·cap) while every member stays
    connected to its bucket's cluster (connected-components dedup downstream
    recovers the full group through the hub).

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
) -> DataFrame:
    """Candidate pairs ``(id1, id2)`` with ``id1 < id2`` per bucket, bounded.

    ``members`` must have one row per (bucket, id); ``bucket_cols`` is the
    bucket key (e.g. ``["bucket"]`` or ``["band", "bucket"]``).

    ``payload_cols`` threads per-member columns through to the pair output as
    ``{col}1`` / ``{col}2`` (e.g. the signature each side needs for a hamming
    verify) — on the star path the hub's payload comes from a ``min_by`` over
    the same bucket window, so no extra join or shuffle is introduced.

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
    sized = members.withColumn("_bsize", F.count("*").over(w)).localCheckpoint(
        eager=False
    )

    small = sized.filter(F.col("_bsize") <= cap).drop("_bsize")
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
    return small_pairs.unionByName(big_pairs)
