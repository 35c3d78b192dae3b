#!/usr/bin/env python
"""Round-16 experiment: thread the document text through the banded-LSH
candidate exchange as a bounded_bucket_pairs payload, replacing the two
doc_id text join-backs in neardup_edit_verify (VERDICT r15 item 3).

Interleaved A/B at sf0.1/32 + value-identity check. Not part of the
engine; results land in OPTIMIZATION_r16.md.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_retention_pipeline_spark.session import get_spark  # noqa: E402
from pyspark_retention_pipeline_spark.tables import load_table  # noqa: E402
import pyspark_retention_pipeline_spark.operators.text as tx  # noqa: E402
from pyspark_retention_pipeline_spark.operators.buckets import (  # noqa: E402
    bounded_bucket_pairs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def variant_threaded(spark, sf_dir):
    """neardup_edit_verify with text as a banding payload (no join-backs)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % tx._VERIFY_SLICE_MOD == 0
    )
    sigs = d.select(
        "doc_id", "text", tx.portable_simhash60(F.col("text")).alias("sig")
    )
    mask = (1 << tx._SIMHASH_BAND_BITS) - 1
    bands = sigs.select(
        "doc_id",
        "sig",
        "text",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * tx._SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(tx._SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sig", "text", "bk.band", "bk.band_val")
    pairs = (
        bounded_bucket_pairs(
            bands,
            ["band", "band_val"],
            "doc_id",
            cap=tx.SIMHASH_BUCKET_CAP,
            payload_cols=["sig", "text"],
            chain_cols=["sig"],
        )
        .select(
            F.col("id1").alias("doc_id_a"),
            F.col("id2").alias("doc_id_b"),
            F.expr("bit_count(sig1 ^ sig2)").cast("long").alias("hamming"),
            F.col("text1").alias("ta"),
            F.col("text2").alias("tb"),
        )
        .where(F.col("hamming") <= tx._SIMHASH_HAMMING_MAX)
        .distinct()
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    j = pairs.repartition(n_parts)
    j = j.withColumn("edit_dist", tx._myers_lev_column(F.col("ta"), F.col("tb")))
    maxlen = F.greatest(F.length("ta"), F.length("tb")).cast("long")
    sim_u = F.round(
        (maxlen - F.col("edit_dist")) * F.lit(1_000_000.0) / maxlen
    ).cast("long")
    return j.select(
        "doc_id_a",
        "doc_id_b",
        "hamming",
        "edit_dist",
        (sim_u / F.lit(1_000_000.0)).alias("edit_sim"),
    )


def main():
    spark = get_spark("exp-neardup-r16", shuffle_partitions=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))

    base = lambda: tx.neardup_edit_verify(spark, SF_DIR)  # noqa: E731
    new = lambda: variant_threaded(spark, SF_DIR)  # noqa: E731

    # value identity
    a = sorted(map(tuple, base().collect()))
    b = sorted(map(tuple, new().collect()))
    print(f"rows base={len(a)} new={len(b)} identical={a == b}", flush=True)

    def noop(df, label):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both plans once, then interleave best-of
    noop(base(), "warm-base")
    noop(new(), "warm-new")
    for i in range(4):
        tb = noop(base(), f"base-{i}")
        tn = noop(new(), f"new-{i}")
        print(f"alt{i}: base {tb:.3f}s  threaded {tn:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
