#!/usr/bin/env python
"""Regenerate the registry-wide shuffle census (tests/shuffle_census.json).

For every registry query, counts the shuffle ``Exchange`` nodes (NOT
``BroadcastExchange`` — broadcasts don't repartition the big side) in the
initial physical plan at a fixed shuffle-partition setting. The census is
a REGRESSION PIN, not an absolute budget: ``tests/test_plans.py::
test_shuffle_census_no_regression`` fails when a query's current count
EXCEEDS its recorded count — a new shuffle is the #1 silent scale
regression (each Exchange is a full rewrite of the stream to disk +
network at 100 TB) — while improvements just make the census stale
(re-run this script and commit the diff alongside the plan change).

Usage::

    python scripts/shuffle_census.py          # rewrites tests/shuffle_census.json
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CENSUS_PATH = os.path.join(REPO, "tests", "shuffle_census.json")
SF_DIR = "/root/testdata/sf0.001"

# Queries whose construction trains models / iterates (plan is scoring, not
# a stable relational DAG) — same skip set as the other registry sweeps.
SKIP = {
    "ml_churn_scores",
    "ml_churn_coefficients",
    "ml_churn_metrics",
    "ml_threshold_from_scores",
    "kmeans_lloyd_curve",
    # bpe_merge_rounds: every stage hides behind a lazy localCheckpoint
    # (LogicalRDD leaves), so the final plan censuses as a vacuous 0 —
    # the pin could never fire (round-12 review finding; same class as
    # kmeans_lloyd_curve).
    "bpe_merge_rounds",
    "bpe_encode_stats",
    # unigram_lm_em_rounds: the EM ladder pins every round's piece
    # inventory and lattice behind lazy localCheckpoints (LogicalRDD
    # leaves), so the returned scorecard censuses as a vacuous count —
    # same class as bpe_merge_rounds.
    "unigram_lm_em_rounds",
    # kcenter_coreset / part_pagerank_rounds: driver-loop iterative ops
    # whose state chains through lazy localCheckpoints (LogicalRDD
    # leaves) — the returned plan censuses as a vacuous count exactly
    # like kmeans_lloyd_curve / bpe_merge_rounds, so a pin could never
    # catch a regression inside the loop.
    "kcenter_coreset",
    "part_pagerank_rounds",
    "kcore_rounds",
    "dedup_clusters",
    "dedup_clusters_portable",
    "curate_corpus_neardup",
    "group_aware_split",
    "group_split_leakage_audit",
}

_EXCHANGE_RE = re.compile(r"\(\d+\) Exchange\b")


def shuffle_count(df) -> int:
    from pyspark_retention_pipeline_spark.plans.inspect import explain_str

    return len(_EXCHANGE_RE.findall(explain_str(df)))


def main() -> None:
    from pyspark_retention_pipeline_spark.registry import all_queries
    from pyspark_retention_pipeline_spark.session import get_spark

    spark = get_spark("shuffle-census", shuffle_partitions=8)
    census: dict[str, int] = {}
    for name, fn in sorted(all_queries().items()):
        if name in SKIP:
            continue
        census[name] = shuffle_count(fn(spark, SF_DIR))
    with open(CENSUS_PATH, "w") as f:
        json.dump(census, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {CENSUS_PATH} ({len(census)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
