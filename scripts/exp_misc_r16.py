#!/usr/bin/env python
"""Round-16 experiments, one session:

A. Relational-tier fan-out sweep at SMALL targets (off/4/8/16) — round 15
   rejected fan-out for churn_features / top_parts_per_segment /
   large_volume_customers / distinct_products at target=32; the byte-rule
   finding says small targets may flip that.
B. neardup_edit_verify DP-pin sweep (8/16/32) — with the native kernel the
   per-task DP work is ~14 ms at 32 parts, near the scheduling floor.
C. top_parts_per_segment "narrower mid-plan types" variant: project
   lineitem to (l_orderkey, l_partkey, scaled-long revenue) before the
   joins so the probes and partial agg carry one long instead of two
   doubles.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import pyspark_retention_pipeline_spark.tables as T  # noqa: E402
from pyspark_retention_pipeline_spark.registry import all_queries  # noqa: E402
from pyspark_retention_pipeline_spark.session import get_spark  # noqa: E402
from pyspark_retention_pipeline_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_new_impl = T._scan_fan_out
_force = [None]  # None = leave call-site behavior; int = force that target


def _patched(spark, df, path, dense=False):
    if _force[0] is None:
        return _new_impl(spark, df, path, dense=dense)
    return df.repartition(_force[0])


def top_parts_narrow(spark, sf_dir):
    from pyspark_retention_pipeline_spark.operators.windows import TOPK_SALT_BUCKETS

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
        .cast("long")
        .alias("rev_u"),
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "l_partkey")
        .agg((F.sum("rev_u") / 10000.0).alias("part_revenue"))
    )
    order = (F.col("part_revenue").desc(), F.col("l_partkey"))
    w_local = Window.partitionBy(
        "segment", F.pmod(F.xxhash64("l_partkey"), F.lit(TOPK_SALT_BUCKETS))
    ).orderBy(*order)
    w_final = Window.partitionBy("segment").orderBy(*order)
    return (
        agg.withColumn("rn", F.row_number().over(w_local))
        .filter(F.col("rn") <= 5)
        .withColumn("rn", F.row_number().over(w_final))
        .filter(F.col("rn") <= 5)
        .select("segment", "l_partkey", "part_revenue")
    )


def main():
    T._scan_fan_out = _patched
    spark = get_spark(
        "exp-misc-r16",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    qs = all_queries()

    def noop(df, label):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # --- A: relational-tier fan-out sweep --------------------------------
    REL = [
        "churn_features",
        "top_parts_per_segment",
        "large_volume_customers",
        "distinct_products",
    ]
    # These queries' loads don't pass fan_out and operator modules hold a
    # direct `from ..tables import load_table` reference, so patch the
    # reference in each owning module.
    orig_load = T.load_table

    def load_forced(spark_, sf_dir_, name_, fan_out=False):
        df = orig_load(spark_, sf_dir_, name_, fan_out=fan_out)
        t = _force[0]
        if t and name_ in ("lineitem", "orders") and not fan_out:
            df = df.repartition(t)
        return df

    import pyspark_retention_pipeline_spark.operators.aggregates as AG
    import pyspark_retention_pipeline_spark.operators.retention as RT
    import pyspark_retention_pipeline_spark.operators.tpch_extra as TX
    import pyspark_retention_pipeline_spark.operators.windows as W

    mods = (AG, RT, TX, W)

    print("A: relational fan-out sweep (off/4/8/16)", flush=True)
    best = {}
    arms = [None, 4, 8, 16]
    for rep in range(3):
        for name in REL:
            for t in arms:
                _force[0] = t
                for m in mods:
                    m.load_table = load_forced if t else orig_load
                w = noop(qs[name](spark, SF_DIR), f"{name}-t{t}-{rep}")
                best[(name, t)] = min(best.get((name, t), 9e9), w)
    for m in mods:
        m.load_table = orig_load
    _force[0] = None
    for name in REL:
        print(
            f"  {name}: "
            + "  ".join(f"t{t}={best[(name, t)]:.3f}" for t in arms),
            flush=True,
        )

    # --- B: neardup DP-pin sweep -----------------------------------------
    print("B: neardup_edit_verify DP-pin sweep (8/16/32)", flush=True)
    bb = {}
    for rep in range(3):
        for k in (32, 16, 8):
            spark.conf.set("spark.sql.shuffle.partitions", str(k))
            df = qs["neardup_edit_verify"](spark, SF_DIR)
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            w = noop(df, f"neardup-pin{k}-{rep}")
            bb[k] = min(bb.get(k, 9e9), w)
    print("  " + "  ".join(f"pin{k}={bb[k]:.3f}" for k in (32, 16, 8)), flush=True)

    # --- C: top_parts narrow mid-plan types ------------------------------
    print("C: top_parts_per_segment narrow-types variant", flush=True)
    base = sorted(map(tuple, qs["top_parts_per_segment"](spark, SF_DIR).collect()))
    new = sorted(map(tuple, top_parts_narrow(spark, SF_DIR).collect()))
    print(f"  identical={base == new} rows={len(base)}", flush=True)
    cc = {}
    for rep in range(3):
        for arm, fn in (
            ("base", lambda: qs["top_parts_per_segment"](spark, SF_DIR)),
            ("narrow", lambda: top_parts_narrow(spark, SF_DIR)),
        ):
            w = noop(fn(), f"topparts-{arm}-{rep}")
            cc[arm] = min(cc.get(arm, 9e9), w)
    print(f"  base={cc['base']:.3f}  narrow={cc['narrow']:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
