#!/usr/bin/env python
"""Synthetic scale-up experiment: generate a K× copy of a testdata SF and
measure how headline plans scale (docs/SCALE.md "Measured: 10× scale-up
curve"). The tables stay distribution-faithful: every scaling table is K
key-offset copies (join cardinalities scale honestly — each copy joins
within itself), fixed dims (region/nation) stay single, and each copied
document gets a one-token perturbation so the near-dup structure densifies
instead of collapsing into exact duplicates.

Usage::

    python scripts/scale_experiment.py --k 10 --out /tmp/sf_syn [--probe]

``--probe`` then times PROBE_QUERIES at the source SF and the synthetic
dir (best-of-3 noop writes, same methodology as bench.py) and prints a
markdown table. The output dir is caller-owned scratch — nothing under
the repo or testdata is touched.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_DEFAULT = "/root/testdata/sf0.1"
# Key stride between copies — far above any real key range at test SFs.
STRIDE = 100_000_000

OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ("region", "nation")

PROBE_QUERIES = [
    "pricing_summary",
    "customer_rfm",
    "churn_features",
    "large_volume_customers",
    "simhash_candidates",
    "minhash_signatures",
    "curate_corpus",
    "rfm_segments",
    "sessionize",
    "ks_price_drift",
    "knn_bruteforce",
    "top_parts_per_segment",
    "dedup_exact",
    "heavy_hitter_tokens",
    "tfidf_top_terms",
    "lsh_bucket_candidates",
    # round 9: the tokenizer tier + the banded-ANN top-1 — the explode-
    # over-vocab, zero-shuffle-rewrite, and payload-threaded-bucket shapes
    "bpe_pair_counts",
    "intradoc_dedup_rewrite",
    "embedding_ann_top1",
]


def generate(spark, src: str, dst: str, k: int) -> None:
    from pyspark.sql import functions as F

    from pyspark_retention_pipeline_spark.tables import load_table

    for t in FIXED_DIMS:
        load_table(spark, src, t).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    for t, keys in OFFSET_KEYS.items():
        base = load_table(spark, src, t)
        parts = []
        for i in range(k):
            df = base
            for c in keys:
                df = df.withColumn(c, (F.col(c) + F.lit(i * STRIDE)).cast("long"))
            if t == "documents" and i > 0:
                suffix = F.lit(f" zcopy{i}")
                df = df.withColumn("text", F.concat(F.col("text"), suffix))
                df = df.withColumn(
                    "n_chars", (F.col("n_chars") + F.length(suffix)).cast("long")
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"generated {t} x{k}", file=sys.stderr)


def probe(spark, src: str, dst: str, reps: int) -> None:
    from pyspark_retention_pipeline_spark.registry import all_queries
    from pyspark_retention_pipeline_spark.tables import TABLES, load_table

    qs = all_queries()
    results: dict[str, list[float]] = {}
    for sf in (src, dst):
        for t in TABLES:
            load_table(spark, sf, t).write.format("noop").mode("overwrite").save()
        for name in PROBE_QUERIES:
            runs = []
            for _ in range(reps):
                df = qs[name](spark, sf)
                start = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - start)
            results.setdefault(name, []).append(round(min(runs), 3))
    print("| query | base | synth | wall ratio |")
    print("|---|---|---|---|")
    for name, (a, b) in results.items():
        print(f"| {name} | {a:.3f} | {b:.3f} | {b / a:.1f} |")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-generate", action="store_true")
    args = ap.parse_args()

    from pyspark_retention_pipeline_spark.session import get_spark

    spark = get_spark("scale-experiment", shuffle_partitions=32)
    if not args.skip_generate:
        generate(spark, args.src, args.out, args.k)
    if args.probe:
        probe(spark, args.src, args.out, args.reps)
    spark.stop()


if __name__ == "__main__":
    main()
