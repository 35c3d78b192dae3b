"""Semantic invariants for the engagement / growth-accounting tier
(operators/engagement.py). Oracle parity is covered by test_oracle_parity;
these pin the accounting identities that parity alone can't express."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pyspark_retention_pipeline_spark.operators.engagement import (
    DAY_US,
    growth_accounting,
    power_user_curve,
    session_duration_histogram,
    stickiness_ratio,
    time_to_conversion,
)
from pyspark_retention_pipeline_spark.operators.events import sessionize
from pyspark_retention_pipeline_spark.tables import load_events


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_events(spark, sf_dir)


def test_growth_accounting_identity(spark, sf_dir, events):
    """Every user is 'new' exactly once, so n_new sums to the user count;
    and each weekly row partitions the week's actives into the 3 classes."""
    ga = growth_accounting(spark, sf_dir).collect()
    n_users = events.select("user_id").distinct().count()
    assert sum(r.n_new for r in ga) == n_users
    first_week = min(r.week for r in ga)
    for r in ga:
        if r.week == first_week:
            assert r.n_retained == 0 and r.n_resurrected == 0
        assert r.n_new >= 0 and r.n_retained >= 0 and r.n_resurrected >= 0


def test_growth_accounting_matches_weekly_actives(spark, sf_dir, events):
    ga = {r.week: r for r in growth_accounting(spark, sf_dir).collect()}
    weekly = {
        r.week: r.n_active
        for r in events.select(
            "user_id", F.expr(f"ts_us DIV {7 * DAY_US}").alias("week")
        )
        .distinct()
        .groupBy("week")
        .agg(F.count("*").alias("n_active"))
        .collect()
    }
    assert set(ga) == set(weekly)
    for week, r in ga.items():
        assert r.n_new + r.n_retained + r.n_resurrected == weekly[week]


def test_stickiness_bounds(spark, sf_dir):
    rows = stickiness_ratio(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mau28 >= r.dau > 0
        assert 0 < r.stickiness <= 1.0


def test_stickiness_mau_covers_trailing_window(spark, sf_dir, events):
    """Spot-check MAU28 on the max-DAU day against a direct filter."""
    rows = stickiness_ratio(spark, sf_dir).collect()
    probe = max(rows, key=lambda r: r.dau)
    direct = (
        events.select("user_id", F.expr(f"ts_us DIV {DAY_US}").alias("day"))
        .filter((F.col("day") <= probe.day) & (F.col("day") >= probe.day - 27))
        .select("user_id")
        .distinct()
        .count()
    )
    assert probe.mau28 == direct


def test_power_user_curve_accounts_for_everyone(spark, sf_dir, events):
    rows = power_user_curve(spark, sf_dir).collect()
    assert sum(r.n_users for r in rows) == events.select("user_id").distinct().count()
    # weighted sum = |distinct (user, day)|
    user_days = (
        events.select("user_id", F.expr(f"ts_us DIV {DAY_US}").alias("day"))
        .distinct()
        .count()
    )
    assert sum(r.n_active_days * r.n_users for r in rows) == user_days


def test_session_duration_histogram_counts_sessions(spark, sf_dir):
    hist = session_duration_histogram(spark, sf_dir).collect()
    n_sessions = sessionize(spark, sf_dir).count()
    assert sum(r.n_sessions for r in hist) == n_sessions
    for r in hist:
        assert r.dur_bucket >= 0 and r.avg_events >= 1.0


def test_time_to_conversion_subset_of_funnel_users(spark, sf_dir, events):
    rows = time_to_conversion(spark, sf_dir).collect()
    both = (
        events.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).alias("s"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts_us"))).alias("p"),
        )
        .filter(F.col("s").isNotNull() & F.col("p").isNotNull())
        .count()
    )
    assert sum(r.n_users for r in rows) <= both
    for r in rows:
        assert r.hours_bucket >= 0 and r.n_users > 0


def test_first_touch_attribution_partitions_users(spark, sf_dir, events):
    from pyspark_retention_pipeline_spark.operators.engagement import (
        first_touch_attribution,
    )

    rows = first_touch_attribution(spark, sf_dir).collect()
    assert sum(r.n_users for r in rows) == events.select("user_id").distinct().count()
    purchasers = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_converted for r in rows) == purchasers
    for r in rows:
        assert 0 <= r.n_converted <= r.n_users
        # a user whose first touch IS a purchase always counts as converted
        if r.first_touch == "purchase":
            assert r.n_converted == r.n_users


def test_rolling_7d_revenue_window_identity(spark, sf_dir):
    from pyspark_retention_pipeline_spark.operators.analytics_extra import (
        rolling_7d_revenue,
    )

    rows = {r.day: r for r in rolling_7d_revenue(spark, sf_dir).collect()}
    for day, r in rows.items():
        expect = round(
            sum(rows[d].revenue for d in range(day - 6, day + 1) if d in rows), 2
        )
        assert abs(r.rolling_7d - expect) < 1e-6, (day, r.rolling_7d, expect)


def test_daily_outer_join_hits_both_null_sides(spark, sf_dir):
    from pyspark_retention_pipeline_spark.operators.analytics_extra import (
        daily_activity_revenue_outer,
    )

    rows = daily_activity_revenue_outer(spark, sf_dir).collect()
    # events (2024-era) and orders (1990s TPC-H dates) calendars are disjoint
    # enough that both unmatched sides must appear.
    assert any(r.n_events == 0 and r.revenue > 0 for r in rows)
    assert any(r.n_events > 0 and r.revenue == 0.0 for r in rows)


def test_bounce_rate_daily_identities(spark, sf_dir):
    """Bounce counts partition the session grain: per-day sessions sum to
    the total session count, bounces are the n_events==1 subset, and the
    rate is their ratio."""
    from pyspark_retention_pipeline_spark.operators.engagement import (
        bounce_rate_daily,
    )

    rows = bounce_rate_daily(spark, sf_dir).collect()
    assert rows
    sess = sessionize(spark, sf_dir)
    assert sum(r.n_sessions for r in rows) == sess.count()
    assert sum(r.n_bounces for r in rows) == sess.filter("n_events = 1").count()
    for r in rows:
        assert 0 <= r.n_bounces <= r.n_sessions
        assert abs(r.bounce_rate - round(r.n_bounces / r.n_sessions, 6)) < 1e-9


def test_audience_overlap_identities(spark, sf_dir, events):
    """Jaccard recomputed from raw user sets matches; bounds hold; the
    pair grid covers every co-occurring type pair exactly once."""
    from pyspark_retention_pipeline_spark.operators.engagement import (
        audience_overlap,
    )

    rows = audience_overlap(spark, sf_dir).collect()
    assert rows
    users = {}
    for r in events.select("user_id", "event_type").distinct().collect():
        users.setdefault(r.event_type, set()).add(r.user_id)
    seen = set()
    for r in rows:
        assert r.t1 < r.t2
        assert (r.t1, r.t2) not in seen
        seen.add((r.t1, r.t2))
        inter = len(users[r.t1] & users[r.t2])
        union = len(users[r.t1] | users[r.t2])
        assert r.n_both == inter
        assert abs(r.jaccard - round(inter / union, 6)) < 1e-9
        assert 0 < r.jaccard <= 1
    expected_pairs = {
        (a, b)
        for a in users
        for b in users
        if a < b and users[a] & users[b]
    }
    assert seen == expected_pairs


def test_retention_by_first_touch_consistent_with_parts(spark, sf_dir, events):
    """Channel totals partition the user base; D7 flags match a direct
    recomputation from first-day + active-day sets."""
    from pyspark_retention_pipeline_spark.operators.engagement import (
        retention_by_first_touch,
    )

    rows = {r.first_touch: r for r in retention_by_first_touch(spark, sf_dir).collect()}
    n_users = events.select("user_id").distinct().count()
    assert sum(r.n_users for r in rows.values()) == n_users
    per_user = {}
    for r in events.select("user_id", "ts_us", "event_id", "event_type").collect():
        day = r.ts_us // 86_400_000_000
        u = per_user.setdefault(r.user_id, {"first": None, "days": set()})
        key = (r.ts_us, r.event_id, r.event_type)
        if u["first"] is None or key < u["first"]:
            u["first"] = key
        u["days"].add(day)
    want = {}
    for u in per_user.values():
        ch = u["first"][2]
        first_day = min(u["days"])
        d7 = 1 if first_day + 7 in u["days"] else 0
        w = want.setdefault(ch, [0, 0])
        w[0] += 1
        w[1] += d7
    for ch, (n, d7) in want.items():
        assert rows[ch].n_users == n and rows[ch].d7_retained == d7


def test_dependent_funnel_monotone(spark, sf_dir):
    from pyspark_retention_pipeline_spark.operators.events import dependent_funnel

    r = dependent_funnel(spark, sf_dir).collect()[0]
    assert r.n_users >= r.n_view >= r.n_click_after_view >= r.n_purchase_after_chain
    assert r.n_view > 0


def test_km_session_survival_is_a_survival_curve(spark, sf_dir):
    """S(t) starts <= 1, is non-increasing, stays positive unless the risk
    set empties; n_at_risk strictly decreases along the curve."""
    from pyspark_retention_pipeline_spark.operators.engagement import (
        km_session_survival,
    )

    rows = sorted(km_session_survival(spark, sf_dir).collect(), key=lambda r: r.t)
    assert rows
    assert all(0.0 <= r.survival <= 1.0 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert b.survival <= a.survival + 1e-9
        assert b.n_at_risk < a.n_at_risk
        assert a.n_ended > 0


def test_ab_ztest_is_an_aa_test_on_this_corpus(spark, sf_dir):
    """The two arms are halves of one population (an A/A test), so the
    z-statistic should be well inside +/-4; counts must reconcile."""
    from pyspark_retention_pipeline_spark.operators.engagement import (
        ab_conversion_ztest,
    )

    r = ab_conversion_ztest(spark, sf_dir).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert 0 <= r.c_a <= r.n_a and 0 <= r.c_b <= r.n_b
    assert abs(r.z_stat) < 4.0


def test_time_decay_attribution_conserves_credit(spark, sf_dir):
    """Credit is conserved: per-channel credited conversions sum to the
    number of purchases with at least one in-window touch, and credited
    value sums to those purchases' total value (within quantization)."""
    from pyspark.sql import functions as F

    from pyspark_retention_pipeline_spark.operators.engagement import (
        ATTR_WINDOW_US,
        time_decay_attribution,
    )
    from pyspark_retention_pipeline_spark.tables import load_events

    rows = time_decay_attribution(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == {"view", "click"}
    e = load_events(spark, sf_dir)
    p = e.where("event_type = 'purchase'").select(
        "user_id", F.col("event_id").alias("cid"), F.col("ts_us").alias("pts"), "value"
    )
    t = e.where("event_type IN ('view','click')").select(
        "user_id", F.col("ts_us").alias("tts")
    )
    attributed = (
        p.join(t, "user_id")
        .where((F.col("tts") < F.col("pts")) & (F.col("tts") >= F.col("pts") - ATTR_WINDOW_US))
        .select("cid", "value")
        .distinct()
    )
    n_conv = attributed.count()
    total_value = attributed.agg(F.sum(F.round(F.col("value") * 100))).first()[0] / 100.0
    assert abs(sum(r.credited_conversions for r in rows) - n_conv) < 1e-3
    assert abs(sum(r.credited_value for r in rows) - total_value) < 0.05
