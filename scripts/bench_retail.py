#!/usr/bin/env python
"""Reference-workload benchmark: the reference pipeline's data scale (500k+
Online-Retail-II-shaped invoice lines, README.md:13-17 of the reference)
through this engine's full lifecycle — feature ETL → seeded splits → weighted
LR training → threshold selection → held-out eval.

The transaction table is synthesized *inside Spark* (range + column
expressions — no driver-side data generation), deterministically from the
row index. Prints one JSON line with per-phase walls.

Usage: python scripts/bench_retail.py [n_lines] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datetime import datetime

N_LINES = int(sys.argv[1]) if len(sys.argv) > 1 else 550_000
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else os.path.join(tempfile.gettempdir(), "retail_bench")
CUTOFF = datetime(2011, 6, 12, 23, 59, 59)


def synth_transactions(spark, n: int):
    """Deterministic Online-Retail-shaped lines: ~55k invoices × ~10 lines,
    ~4.3k customers, ~200 products, 2009-12..2011-12 span, with guests (~15%),
    returns (~2%) and zero-price errors (~1%) to exercise the validity filter."""
    from pyspark.sql import functions as F

    df = spark.range(n)
    inv = (F.col("id") / 10).cast("long")
    h = F.xxhash64(F.col("id"))
    hinv = F.xxhash64(inv)
    cust = F.pmod(hinv, F.lit(4300))
    # invoice date: seconds offset within a 2-year window, constant per invoice
    epoch0 = int(datetime(2009, 12, 1).timestamp())
    date = F.timestamp_seconds(F.lit(epoch0) + F.pmod(hinv, F.lit(63_000_000)))
    return df.select(
        F.concat(F.lit("I"), inv.cast("string")).alias("Invoice"),
        F.concat(F.lit("SKU"), F.pmod(h, F.lit(200)).cast("string")).alias("StockCode"),
        F.lit("item").alias("Description"),
        F.when(F.pmod(h, 100) < 2, -1).otherwise(1 + F.pmod(h, F.lit(12))).cast("int").alias("Quantity"),
        date.alias("InvoiceDate"),
        F.when(F.pmod(h, 100) == 2, 0.0)
        .otherwise(F.round((1 + F.pmod(h, F.lit(5000))) / 100.0, 2))
        .alias("UnitPrice"),
        F.when(F.pmod(hinv, 100) < 15, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("C"), cust.cast("string")))
        .alias("CustomerID"),
        F.lit("United Kingdom").alias("Country"),
    )


def main() -> None:
    from pyspark_retention_pipeline_spark import get_spark
    from pyspark_retention_pipeline_spark.ml import (
        evaluate_model,
        score_frame,
        train_churn_model,
    )
    from pyspark_retention_pipeline_spark.ml.workflow import SEED, SPLIT_WEIGHTS, _sweep_best_threshold
    from pyspark_retention_pipeline_spark.retail import build_features_and_labels

    spark = get_spark("bench-retail")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    tx = synth_transactions(spark, N_LINES)
    tx.write.mode("overwrite").parquet(os.path.join(OUT_DIR, "raw"))
    timings["synth_and_write_raw"] = round(time.perf_counter() - t0, 3)

    raw = spark.read.parquet(os.path.join(OUT_DIR, "raw"))
    t0 = time.perf_counter()
    features = build_features_and_labels(raw, CUTOFF).cache()
    features.write.mode("overwrite").parquet(os.path.join(OUT_DIR, "features"))
    train, val, test = features.randomSplit(SPLIT_WEIGHTS, seed=SEED)
    for name, df in (("train", train), ("val", val), ("test", test)):
        df.write.mode("overwrite").parquet(os.path.join(OUT_DIR, name))
    timings["feature_etl_and_splits"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    model = train_churn_model(train.withColumnRenamed("CustomerID", "custkey"))
    timings["train_lr"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    scored_val = score_frame(model, val.withColumnRenamed("CustomerID", "custkey"))
    best = _sweep_best_threshold(scored_val)
    timings["threshold_sweep"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    metrics = evaluate_model(model, test.withColumnRenamed("CustomerID", "custkey"))
    timings["eval_test"] = round(time.perf_counter() - t0, 3)

    n_customers = features.count()
    print(
        json.dumps(
            {
                "workload": "reference-scale retail lifecycle",
                "n_lines": N_LINES,
                "n_customers": n_customers,
                "total_sec": round(sum(timings.values()), 3),
                "phases": timings,
                "best_threshold": best["best_threshold"],
                "test_auc_roc": round(metrics["areaUnderROC"], 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
