#!/usr/bin/env python
"""Round-16 broad A/B: re-test the remaining un-fanned headline queries at
the byte-sized fan-out target (round 15 rejected them at target=32; the
half-cap byte rule changes the arithmetic). Patches every operator
module's load_table reference; interleaved best-of-3 per arm.
"""
from __future__ import annotations

import importlib
import os
import pkgutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark_retention_pipeline_spark.operators as OPS  # noqa: E402
import pyspark_retention_pipeline_spark.tables as T  # noqa: E402
from pyspark_retention_pipeline_spark.registry import all_queries  # noqa: E402
from pyspark_retention_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    # events tier (top_session_paths already flipped and won 0.77->0.58)
    "sessionize",
    "km_session_survival",
    "stickiness_ratio",
    "cohort_retention",
    "growth_accounting",
    "tumbling_hourly",
    "time_decay_attribution",
    "json_props",
    # lineitem/orders tier
    "pricing_summary",
    "q20_excess_stock",
    "q2_min_cost_supplier",
    "psi_price_drift",
    "threshold_curve",
    "customer_rfm",
    "rfm_segments",
    # documents tier
    "ngram_contamination",
    "curate_corpus",
    "token_budget_select",
    "tfidf_top_terms",
    "udtf_sentence_split",
    "bpe_pair_counts",
]


def main():
    mods = []
    for m in pkgutil.iter_modules(OPS.__path__):
        mod = importlib.import_module(f"{OPS.__name__}.{m.name}")
        if hasattr(mod, "load_table") or hasattr(mod, "load_events"):
            mods.append(mod)
    orig_lt, orig_le = T.load_table, T.load_events

    def lt_fan(spark_, sf_dir_, name_, fan_out=False):
        return orig_lt(spark_, sf_dir_, name_, fan_out=True)

    def le_fan(spark_, sf_dir_, fan_out=False):
        return orig_le(spark_, sf_dir_, fan_out=True)

    def set_arm(fan):
        for mod in mods:
            if hasattr(mod, "load_table"):
                mod.load_table = lt_fan if fan else orig_lt
            if hasattr(mod, "load_events"):
                mod.load_events = le_fan if fan else orig_le

    spark = get_spark(
        "exp-broad-r16",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    qs = all_queries()

    def noop(name, label):
        spark.sparkContext.setJobDescription(label)
        df = qs[name](spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for n in QUERIES:
        for arm in (False, True):
            set_arm(arm)
            noop(n, f"warm-{n}-{arm}")
    best = {}
    for rep in range(3):
        for n in QUERIES:
            for arm in (False, True):
                set_arm(arm)
                w = noop(n, f"{n}-{'fan' if arm else 'base'}-{rep}")
                best[(n, arm)] = min(best.get((n, arm), 9e9), w)
    set_arm(False)
    print("query,base,fan", flush=True)
    for n in QUERIES:
        b, f = best[(n, False)], best[(n, True)]
        print(f"{n},{b:.3f},{f:.3f},{'WIN' if f < b * 0.93 else ('LOSS' if f > b * 1.07 else 'wash')}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
