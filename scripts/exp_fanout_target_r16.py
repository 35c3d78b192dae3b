#!/usr/bin/env python
"""Round-16 experiment: sweep the scan fan-out repartition target (8/16/32)
at 32 cores for the queries whose 8-core walls beat their 32-core walls in
PERF_r15 (crossdoc_span_rewrite 0.47, semdedup_keep 0.57,
minhash_signatures 0.68, crossmodal_retrieval_metrics 0.50, rrf_fusion),
with the round-15 fan-out winners as regression guards (VERDICT item 7).

Interleaved per-rep round-robin over targets so host drift hits every arm
equally. Results land in OPTIMIZATION_r16.md.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark_retention_pipeline_spark.tables as T  # noqa: E402
from pyspark_retention_pipeline_spark.registry import all_queries  # noqa: E402
from pyspark_retention_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    # scaling-ratio-<1 shapes (the targets of item 7)
    "crossdoc_span_rewrite",
    "semdedup_keep",
    "minhash_signatures",
    "crossmodal_retrieval_metrics",
    "rrf_fusion",
    # round-15 fan-out winners (must not regress)
    "simhash64",
    "winnowing_fingerprints",
    "dsir_importance_select",
    "bigram_logprob_score",
    "embedding_quantize_stats",
]

TARGETS = [32, 16, 8]
REPS = 3

_orig_fan_out = T._scan_fan_out
_target_override = [None]


def _patched(spark, df, path):
    try:
        if not os.path.isfile(path):
            return df
        nbytes = os.path.getsize(path)
    except OSError:
        return df
    if not (T._FANOUT_MIN_BYTES <= nbytes <= T._FANOUT_MAX_BYTES):
        return df
    t = _target_override[0] or spark.sparkContext.defaultParallelism
    if t <= 1:
        return df
    return df.repartition(t)


def main():
    T._scan_fan_out = _patched
    spark = get_spark(
        "exp-fanout-r16",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    qs = all_queries()

    def noop(name, label):
        spark.sparkContext.setJobDescription(label)
        df = qs[name](spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm every (query, target) plan once
    for name in QUERIES:
        for t in TARGETS:
            _target_override[0] = t
            noop(name, f"warm-{name}-{t}")

    best: dict[tuple[str, int], float] = {}
    for rep in range(REPS):
        for name in QUERIES:
            for t in TARGETS:
                _target_override[0] = t
                w = noop(name, f"{name}-t{t}-rep{rep}")
                k = (name, t)
                best[k] = min(best.get(k, 9e9), w)
    print("query,target32,target16,target8", flush=True)
    for name in QUERIES:
        print(
            f"{name},"
            + ",".join(f"{best[(name, t)]:.3f}" for t in TARGETS),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
