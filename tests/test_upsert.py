"""Upsert / SCD2 semantics on literal frames."""

from __future__ import annotations

import datetime

from pyspark_retention_pipeline_spark.operators.upsert import scd2_apply, upsert


def test_upsert_replaces_matched_inserts_new(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    out = {r["id"]: (r["name"], r["v"]) for r in upsert(target, updates, ["id"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_scd2_closes_and_appends(spark):
    t0 = datetime.datetime(2020, 1, 1)
    t1 = datetime.datetime(2021, 6, 1)
    current = spark.createDataFrame(
        [
            (1, "alice", t0, None),   # open version, will change
            (2, "bob", t0, None),     # open version, unchanged
            (1, "al", datetime.datetime(2019, 1, 1), t0),  # closed history
        ],
        "id long, name string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, "alicia", t1)], "id long, name string, changed_at timestamp"
    )
    out = scd2_apply(current, changes, "id", "changed_at")
    rows = sorted(
        ((r["id"], r["name"], r["valid_from"], r["valid_to"]) for r in out.collect())
    )
    assert rows == sorted(
        [
            (1, "al", datetime.datetime(2019, 1, 1), t0),  # history untouched
            (1, "alice", t0, t1),                          # closed at change ts
            (1, "alicia", t1, None),                       # new open version
            (2, "bob", t0, None),                          # unchanged key
        ]
    )
    # exactly one open version per key
    open_counts = out.filter("valid_to IS NULL").groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in open_counts)


def test_cdc_multi_action_apply_deletes_and_updates(spark, sf_dir):
    """Deleted keys vanish, updated keys carry the new values, everything
    else is untouched — checked against a Python reconstruction."""
    import pyspark.sql.functions as F

    from pyspark_retention_pipeline_spark.operators.upsert import (
        UPD_MOD,
        cdc_multi_action_apply,
    )
    from pyspark_retention_pipeline_spark.tables import load_table

    got = {r.o_orderkey: r for r in cdc_multi_action_apply(spark, sf_dir).collect()}
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("p")
    )
    n_del = n_upd = 0
    for r in base.collect():
        k = r.o_orderkey
        if k % (UPD_MOD * 2) == 0:
            assert k not in got
            n_del += 1
        elif k % UPD_MOD == 0:
            assert got[k].o_orderstatus == "U"
            assert abs(got[k].o_totalprice - round(r.p + 100.0, 2)) < 1e-9
            n_upd += 1
        else:
            assert got[k].o_orderstatus == r.o_orderstatus
    assert n_del > 0 and n_upd > 0
    assert len(got) == base.count() - n_del
