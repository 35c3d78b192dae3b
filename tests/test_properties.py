"""Property-based tests (hypothesis) for the engine's determinism and
algebraic invariants — SURVEY.md §5's upgrade over the reference's
zero-test posture."""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from pyspark_retention_pipeline_spark.exprs import scaled_sum

MONEY = st.decimals(
    min_value=Decimal("-99999.99"), max_value=Decimal("99999.99"), places=2
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(values=st.lists(MONEY, min_size=1, max_size=40))
@SETTINGS
def test_scaled_sum_partition_order_independent(spark, values):
    """scaled_sum must equal the exact Decimal sum regardless of
    partitioning — the property that makes oracle hashes stable."""
    exact = float(sum(values))
    rows = [(float(v),) for v in values]
    df1 = spark.createDataFrame(rows, "v double").coalesce(1)
    df8 = spark.createDataFrame(rows, "v double").repartition(8)
    r1 = df1.agg(scaled_sum(F.col("v"), 2).alias("s")).collect()[0]["s"]
    r8 = df8.agg(scaled_sum(F.col("v"), 2).alias("s")).collect()[0]["s"]
    assert r1 == r8 == pytest.approx(exact, abs=1e-9)


@given(
    gaps_s=st.lists(st.integers(min_value=1, max_value=7200), min_size=1, max_size=30)
)
@SETTINGS
def test_sessionize_matches_python_reference(spark, gaps_s, monkeypatch):
    """Spark sessionization == a straightforward single-threaded reference
    over arbitrary inter-event gaps."""
    import pyspark_retention_pipeline_spark.operators.events as ev

    ts, times = 1_000_000_000_000, []
    for g in gaps_s:
        times.append(ts)
        ts += g * 1_000_000
    rows = [(i, 7, t) for i, t in enumerate(times)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long")
    monkeypatch.setattr(ev, "load_events", lambda *_: df)
    got = {
        (r["session_id"], r["n_events"])
        for r in ev.sessionize(spark, "ignored").collect()
    }

    # Python reference: new session when gap > 30 min.
    sessions, count = [], 0
    for i, t in enumerate(times):
        if i == 0 or t - times[i - 1] > ev.SESSION_GAP_US:
            if count:
                sessions.append(count)
            count = 1
        else:
            count += 1
    sessions.append(count)
    expected = {(i + 1, n) for i, n in enumerate(sessions)}
    assert got == expected


@given(
    labels=st.lists(st.booleans(), min_size=3, max_size=60),
    data=st.data(),
)
@SETTINGS
def test_threshold_curve_invariants(spark, labels, data):
    """Recall is non-increasing in t; tp+fn is constant; precision/recall
    stay in [0,1] under the reference's guard semantics."""
    from pyspark_retention_pipeline_spark.operators.threshold import _with_metrics

    scores = [
        data.draw(st.integers(min_value=0, max_value=100)) / 100.0 for _ in labels
    ]
    rows = [(float(l), s) for l, s in zip(labels, scores)]
    scored = spark.createDataFrame(rows, "label double, score double")
    expanded = scored.select(
        "label", "score", F.explode(F.sequence(F.lit(0), F.lit(100))).alias("i")
    ).withColumn("t", F.col("i").cast("double") / F.lit(100.0))
    hit = F.col("score") >= F.col("t")
    pos = F.col("label") == 1
    sweep = expanded.groupBy("t").agg(
        F.sum(F.when(hit & pos, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(hit & ~pos, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~hit & pos, 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~hit & ~pos, 1).otherwise(0)).alias("tn"),
    )
    curve = _with_metrics(sweep).orderBy("t").collect()
    n_pos = sum(1 for l in labels if l)
    recalls = [r["recall"] for r in curve]
    assert all(recalls[i] >= recalls[i + 1] - 1e-12 for i in range(len(recalls) - 1))
    for r in curve:
        assert r["tp"] + r["fn"] == n_pos
        assert 0.0 <= r["precision"] <= 1.0 and 0.0 <= r["recall"] <= 1.0
