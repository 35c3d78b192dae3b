"""Semantic invariants for the time-series tier (operators/timeseries.py)
and the temperature-mixture weights (operators/curation.py). Oracle parity
is covered by test_oracle_parity; these pin the identities and magnitude
properties parity alone can't express (the round-5 lesson: rows>0 passes on
garbage — assert the numbers mean what they claim)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pyspark_retention_pipeline_spark.operators.curation import (
    source_temperature_weights,
)
from pyspark_retention_pipeline_spark.operators.timeseries import (
    DAY_US,
    PATH_CAP,
    cumulative_new_users,
    daily_anomaly_zscore,
    top_session_paths,
    weekday_hour_heatmap,
)
from pyspark_retention_pipeline_spark.operators.events import sessionize
from pyspark_retention_pipeline_spark.tables import load_events, load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_events(spark, sf_dir)


def test_cumulative_new_users_telescopes_to_user_count(spark, sf_dir, events):
    """The curve is monotone, its increments are the per-day n_new, and the
    final value is exactly the corpus-wide distinct-user count."""
    rows = cumulative_new_users(spark, sf_dir).orderBy("day").collect()
    assert rows, "empty curve"
    running = 0
    prev_day = None
    for r in rows:
        assert prev_day is None or r.day > prev_day
        assert r.n_new > 0  # days with no first-time users don't emit rows
        running += r.n_new
        assert r.cum_users == running
        prev_day = r.day
    n_users = events.select("user_id").distinct().count()
    assert rows[-1].cum_users == n_users


def test_cumulative_new_users_day_magnitude(spark, sf_dir):
    """Day buckets live in the 2020s (epoch-day ~18k-23k) — the unit-drift
    tripwire that would have caught the round-5 ns->us break."""
    days = [r.day for r in cumulative_new_users(spark, sf_dir).collect()]
    assert all(18_000 < d < 24_000 for d in days), sorted(days)[:5]


def test_daily_anomaly_zscore_window_semantics(spark, sf_dir, events):
    """Recompute one day's trailing stats directly from the day-count frame
    and check the operator's mean/z agree; frame excludes the current day."""
    day_counts = {
        r.day: r.n
        for r in events.groupBy(F.expr(f"ts_us DIV {DAY_US}").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    out = {r.day: r for r in daily_anomaly_zscore(spark, sf_dir).collect()}
    assert out, "no anomaly rows"
    for day, r in list(out.items())[:10]:
        trail = [day_counts[d] for d in range(day - 7, day) if d in day_counts]
        assert len(trail) >= 3
        mean = sum(trail) / len(trail)
        assert abs(r.mean7 - mean) < 1e-4
        var = sum(c * c for c in trail) / len(trail) - mean * mean
        if var > 0:
            z = (day_counts[day] - mean) / var**0.5
            assert abs(r.zscore - z) < 1e-4
    # Every day with >= 3 trailing observed days must be present.
    expected = {
        d
        for d in day_counts
        if sum(1 for k in range(d - 7, d) if k in day_counts) >= 3
    }
    assert set(out) == expected


def test_weekday_hour_heatmap_partitions_the_events(spark, sf_dir, events):
    rows = weekday_hour_heatmap(spark, sf_dir).collect()
    assert 0 < len(rows) <= 168
    assert all(0 <= r.dow <= 6 and 0 <= r.hour <= 23 for r in rows)
    assert sum(r.n_events for r in rows) == events.count()
    n_users = events.select("user_id").distinct().count()
    assert all(0 < r.n_users <= min(r.n_events, n_users) for r in rows)


def test_weekday_hour_heatmap_matches_datetime(spark, sf_dir, events):
    """Rebuild the heatmap in Python with datetime weekday()/hour (UTC) and
    compare cell-for-cell — pins the 0=Monday anchor and the hour bucketing
    against an independent calendar implementation."""
    from collections import Counter
    from datetime import datetime, timezone

    want = Counter()
    for r in events.select("ts_us").collect():
        dt = datetime.fromtimestamp(r.ts_us / 1_000_000, tz=timezone.utc)
        want[(dt.weekday(), dt.hour)] += 1
    got = {
        (r.dow, r.hour): r.n_events
        for r in weekday_hour_heatmap(spark, sf_dir).collect()
    }
    assert got == dict(want)


def test_top_session_paths_bounded_and_consistent(spark, sf_dir):
    rows = top_session_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    n_sessions = sessionize(spark, sf_dir).count()
    assert sum(r.n_sessions for r in rows) <= n_sessions
    # Descending count with path tie-break; paths capped at PATH_CAP steps.
    for a, b in zip(rows, rows[1:]):
        assert (a.n_sessions, b.path) >= (b.n_sessions, a.path) or (
            a.n_sessions > b.n_sessions
        )
    for r in rows:
        assert 1 <= len(r.path.split(",")) <= PATH_CAP


def test_source_temperature_weights_flattens_the_mix(spark, sf_dir):
    """Shares sum to ~1; sqrt-temperature compresses the mix: the heaviest
    source loses share, the lightest gains, and the share ordering is
    preserved (x -> sqrt(x) is monotone)."""
    rows = source_temperature_weights(spark, sf_dir).collect()
    assert len(rows) >= 2, "need a multi-source corpus for a mixture"
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-4
    by_raw = sorted(rows, key=lambda r: r.raw_share)
    assert by_raw[-1].temp_share <= by_raw[-1].raw_share
    assert by_raw[0].temp_share >= by_raw[0].raw_share
    assert [r.source for r in by_raw] == [
        r.source for r in sorted(rows, key=lambda r: r.temp_share)
    ]
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert abs(sum(r.expected_docs for r in rows) - 1_000_000) <= len(rows)


def test_revenue_trend_forecast_matches_numpy_ols(spark, sf_dir):
    """Closed-form moment-sum OLS agrees with numpy polyfit on the collected
    daily series; the forecast evaluates the fitted line 7 days out."""
    import numpy as np
    import pyspark.sql.functions as F

    from pyspark_retention_pipeline_spark.operators.timeseries import (
        FORECAST_DAYS,
        OLS_BASE_DAY,
        revenue_trend_forecast,
    )

    row = revenue_trend_forecast(spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long").alias("day")
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) DIV 100 AS BIGINT)"
            ).alias("dollars")
        )
        .collect()
    )
    x = np.array([r.day for r in daily], dtype=np.float64)
    y = np.array([r.dollars for r in daily], dtype=np.float64)
    slope, intercept = np.polyfit(x, y, 1)
    assert row.n_days == len(daily)
    assert abs(row.slope_per_day - slope) < max(1e-6, abs(slope) * 1e-6)
    want = intercept + slope * (max(x) + FORECAST_DAYS)
    assert abs(row.forecast_revenue - want) < max(0.05, abs(want) * 1e-6)
    assert row.forecast_day == int(max(x)) + FORECAST_DAYS


def test_user_type_entropy_bounds_and_examples(spark, sf_dir, events):
    """Entropy ∈ [0, ln(n_types)]; single-type users score 0; a hand
    recomputation agrees for a sample of users."""
    import math

    from pyspark_retention_pipeline_spark.operators.timeseries import (
        user_type_entropy,
    )

    rows = user_type_entropy(spark, sf_dir).collect()
    n_users = events.select("user_id").distinct().count()
    assert len(rows) == n_users
    counts = {}
    for r in events.groupBy("user_id", "event_type").count().collect():
        counts.setdefault(r.user_id, {})[r.event_type] = r["count"]
    for r in rows[:40]:
        assert -1e-9 <= r.entropy <= math.log(r.n_types) + 1e-9
        if r.n_types == 1:
            assert r.entropy == 0.0
        c = counts[r.user_id]
        n = sum(c.values())
        want = sum(-(v / n) * math.log(v / n) for v in c.values())
        assert abs(r.entropy - want) < 1e-5
        assert r.n_events == n and r.n_types == len(c)


def test_nation_revenue_trend_matches_numpy_grouped(spark, sf_dir):
    """Grouped closed-form OLS agrees with per-group numpy polyfit, and r²
    sits in [0, 1]."""
    import numpy as np
    import pyspark.sql.functions as F

    from pyspark_retention_pipeline_spark.operators.timeseries import (
        OLS_BASE_MONTH,
        nation_revenue_trend,
    )

    rows = {r.nation: r for r in nation_revenue_trend(spark, sf_dir).collect()}
    assert rows
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    nm = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1 - OLS_BASE_MONTH)
            .cast("long")
            .alias("x"),
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) DIV 10000"
                " AS BIGINT)"
            ).alias("y")
        )
        .collect()
    )
    series = {}
    for r in nm:
        series.setdefault(r.nation, []).append((r.x, r.y))
    for nation, r in list(rows.items())[:8]:
        pts = sorted(series[nation])
        x = np.array([p[0] for p in pts], dtype=np.float64)
        y = np.array([p[1] for p in pts], dtype=np.float64)
        slope = np.polyfit(x, y, 1)[0] * 100  # back to dollars/month
        assert r.n_months == len(pts)
        assert abs(r.slope_per_month - slope) < max(1e-2, abs(slope) * 1e-6)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        assert abs(r.r2 - r2) < 1e-6
        assert -1e-9 <= r.r2 <= 1 + 1e-9


def test_user_value_twap_matches_python(spark, sf_dir, events):
    """TWAP recomputed per user in Python agrees; bounds: twap within
    [min(value), max(value)] of the user's weighted observations."""
    from pyspark_retention_pipeline_spark.operators.timeseries import (
        user_value_twap,
    )

    got = {r.user_id: r for r in user_value_twap(spark, sf_dir).collect()}
    assert got
    per_user = {}
    for r in events.select("user_id", "ts_us", "event_id", "value").collect():
        per_user.setdefault(r.user_id, []).append((r.ts_us, r.event_id, r.value))
    for uid, rows in list(per_user.items())[:40]:
        rows.sort()
        terms = []
        for (t, _, v), (t2, _, _) in zip(rows, rows[1:]):
            gap_s = (t2 - t) // 1_000_000
            terms.append((round(v * 10_000), gap_s))
        span = sum(g for _, g in terms)
        if span <= 0:
            assert uid not in got
            continue
        want = sum(v * g for v, g in terms) / span / 10_000
        assert abs(got[uid].twap - want) < 1e-5
        assert got[uid].span_s == span
        vals = [v / 10_000 for v, g in terms if g > 0]
        assert min(vals) - 1e-6 <= got[uid].twap <= max(vals) + 1e-6


def test_interarrival_acf_matches_numpy_and_filters_constant(spark, sf_dir):
    """acf1 recomputed from first principles (numpy) for a few users, and a
    synthetic constant-gap user is dropped by the zero-variance filter."""
    import numpy as np

    from pyspark_retention_pipeline_spark.operators.timeseries import (
        interarrival_acf,
    )
    from pyspark_retention_pipeline_spark.tables import load_events

    got = {r.user_id: r for r in interarrival_acf(spark, sf_dir).collect()}
    assert got, "no users passed the n>=3 filter"
    ev = (
        load_events(spark, sf_dir)
        .select("user_id", "ts_us", "event_id")
        .orderBy("user_id", "ts_us", "event_id")
        .collect()
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r.ts_us)
    checked = 0
    for uid, row in list(got.items())[:5]:
        ts = by_user[uid]
        gaps = np.array([(b - a) // 1_000_000 for a, b in zip(ts, ts[1:])], dtype=float)
        mean = gaps.mean()
        num = float(((gaps[:-1] - mean) * (gaps[1:] - mean)).sum())
        den = float(((gaps - mean) ** 2).sum())
        assert row.n_gaps == len(gaps)
        assert abs(row.acf1 - num / den) < 1e-6, uid
        checked += 1
    assert checked == 5

    # constant gaps -> zero variance -> the FULL pipeline must exclude the
    # user (den <> 0), not divide by zero; a bursty user must survive.
    from pyspark_retention_pipeline_spark.operators.timeseries import (
        interarrival_acf_frame,
    )

    const_rows = [(99_999_991, 1_000_000 * 60 * k, 10_000 + k) for k in range(6)]
    bursty_ts = [0, 60, 120, 3600, 3660, 3720, 7200, 7260]
    bursty_rows = [
        (99_999_992, 1_000_000 * t, 20_000 + i) for i, t in enumerate(bursty_ts)
    ]
    df = spark.createDataFrame(
        const_rows + bursty_rows, "user_id long, ts_us long, event_id long"
    )
    out = {r.user_id: r for r in interarrival_acf_frame(df).collect()}
    assert 99_999_991 not in out  # zero-variance user excluded by den<>0
    assert 99_999_992 in out      # non-degenerate user scored
    assert out[99_999_992].n_gaps == len(bursty_ts) - 1


def test_theilsen_matches_numpy(spark, sf_dir):
    """Median-of-pairwise-slopes recomputed from first principles — guards
    against a *shared* misconception in both engines' SQL (parity alone
    can't see one)."""
    import numpy as np

    from pyspark_retention_pipeline_spark.operators.timeseries import (
        OLS_BASE_DAY,
        theilsen_revenue_trend,
    )
    from pyspark_retention_pipeline_spark.tables import load_table

    row = theilsen_revenue_trend(spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").collect()
    daily = {}
    for r in o:
        d = (r.o_orderdate.date() - __import__("datetime").date(1970, 1, 1)).days - OLS_BASE_DAY
        daily[d] = daily.get(d, 0) + round(r.o_totalprice * 100)
    xs = sorted(daily)
    ys = [daily[x] // 100 for x in xs]
    slopes = [
        (ys[j] - ys[i]) / float(xs[j] - xs[i])
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    ]
    assert row.n_days == len(xs)
    assert row.n_pairs == len(slopes)
    assert abs(row.ts_slope_per_day - np.median(slopes)) < 1e-6


def test_theilsen_builds_without_a_job(spark, sf_dir, monkeypatch):
    """Constructing the query must not trigger a Spark job (the
    pack_documents rule: no driver-side count at plan-build time)."""
    from pyspark.sql import DataFrame

    from pyspark_retention_pipeline_spark.operators.timeseries import (
        theilsen_revenue_trend,
    )

    def boom(self):
        raise AssertionError("count() during query construction")

    monkeypatch.setattr(DataFrame, "count", boom)
    df = theilsen_revenue_trend(spark, sf_dir)
    assert df.columns == ["n_days", "n_pairs", "ts_slope_per_day"]


def test_locf_fill_invariants(spark, sf_dir):
    """Dense contiguous spine per user, first day always observed (LOCF has
    something to carry), filled values never null."""
    from pyspark.sql import functions as F

    from pyspark_retention_pipeline_spark.operators.timeseries import locf_fill

    out = locf_fill(spark, sf_dir)
    per_user = out.groupBy("user_id").agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.count("*").alias("n"),
        F.min(F.when(F.col("is_observed"), F.col("day"))).alias("first_obs"),
    )
    bad = per_user.where(
        (F.col("n") != F.col("d1") - F.col("d0") + 1)
        | (F.col("first_obs") != F.col("d0"))
    ).count()
    assert bad == 0
    assert out.where(F.col("value_filled").isNull()).count() == 0


def test_theilsen_bracket_median_small_and_tied_corpora(spark, monkeypatch):
    """The approx-bracket exact-median path's edge cases, planted: tiny n
    (where approx_percentile is exact), even vs odd pair counts (the two
    middle ranks straddle two distinct values), and a massively TIED slope
    multiset (every value equal — the bracket degenerates to one value and
    the cumulative-count pick must still land both ranks). Median values
    recomputed from first principles per corpus."""
    import statistics

    import pyspark_retention_pipeline_spark.operators.timeseries as ts

    def run(day_vals):
        rows = [
            (f"1970-01-{d+1:02d}", float(v))
            for d, v in day_vals
        ]
        o = spark.createDataFrame(
            rows, "o_orderdate string, o_totalprice double"
        ).selectExpr("CAST(o_orderdate AS DATE) AS o_orderdate", "o_totalprice")
        monkeypatch.setattr(ts, "load_table", lambda *_, **__: o)
        r = ts.theilsen_revenue_trend(spark, "x").collect()[0]
        xs = sorted(d for d, _ in day_vals)
        vals = dict(day_vals)
        slopes = [
            (vals[xs[j]] - vals[xs[i]]) / (xs[j] - xs[i])
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
        ]
        assert r.n_days == len(xs) and r.n_pairs == len(slopes)
        assert abs(r.ts_slope_per_day - statistics.median(slopes)) < 1e-6

    run([(0, 10.0), (1, 20.0), (2, 40.0)])          # n_pairs=3, odd
    run([(0, 10.0), (1, 20.0), (2, 40.0), (3, 45.0)])  # n_pairs=6, even
    run([(0, 10.0), (1, 20.0)])                      # n_pairs=1, minimal
    # perfectly linear: every pairwise slope identical (fully tied bracket)
    run([(d, 10.0 * (d + 1)) for d in range(6)])     # n_pairs=15, all 10.0
