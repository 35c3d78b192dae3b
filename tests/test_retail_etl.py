"""Reference-schema ETL parity: Online-Retail-shaped transactions through the
full feature/label build, with hand-computed expectations."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark_retention_pipeline_spark.retail import (
    FEATURE_COLUMNS,
    build_features_and_labels,
)

CUTOFF = datetime(2011, 6, 12, 23, 59, 59)

# Three customers with known behavior around the cutoff:
#   C1 — two orders before cutoff (one recent), buys again in lookahead -> retained
#   C2 — two orders before cutoff, silent afterwards -> churned
#   C3 — single old order (fails the cohort filter: 1 order AND recency>180)
#   guest rows (null customer), returns (qty<0) and bad prices are dropped
ROWS = [
    # Invoice, StockCode, Description, Quantity, InvoiceDate, UnitPrice, CustomerID, Country
    ("I1", "A", "x", 2, datetime(2011, 1, 10), 5.0, "C1", "UK"),
    ("I1", "B", "x", 1, datetime(2011, 1, 10), 10.0, "C1", "UK"),
    ("I2", "A", "x", 3, datetime(2011, 5, 20), 5.0, "C1", "UK"),
    ("I3", "C", "x", 1, datetime(2011, 8, 1), 7.0, "C1", "UK"),   # lookahead buy
    ("I4", "A", "x", 1, datetime(2011, 2, 1), 5.0, "C2", "UK"),
    ("I5", "B", "x", 2, datetime(2011, 6, 1), 10.0, "C2", "UK"),
    ("I6", "A", "x", 1, datetime(2010, 1, 1), 5.0, "C3", "UK"),
    ("I7", "A", "x", 4, datetime(2011, 6, 1), 5.0, None, "UK"),   # guest -> dropped
    ("I8", "A", "x", -2, datetime(2011, 6, 1), 5.0, "C2", "UK"),  # return -> dropped
    ("I9", "A", "x", 1, datetime(2011, 6, 1), 0.0, "C2", "UK"),   # bad price -> dropped
]

SCHEMA = (
    "Invoice string, StockCode string, Description string, Quantity int, "
    "InvoiceDate timestamp, UnitPrice double, CustomerID string, Country string"
)


@pytest.fixture(scope="module")
def features(spark):
    tx = spark.createDataFrame(ROWS, SCHEMA)
    return {r["CustomerID"]: r for r in build_features_and_labels(tx, CUTOFF).collect()}


def test_schema_and_cohort(features):
    assert set(features) == {"C1", "C2"}  # C3 filtered by the cohort rule
    for r in features.values():
        assert list(r.asDict()) == FEATURE_COLUMNS


def test_retained_customer_features(features):
    c1 = features["C1"]
    assert c1["label"] == 0.0  # bought in the lookahead window
    assert c1["total_orders"] == 2.0  # I1, I2 (I3 is after cutoff)
    assert c1["total_qty"] == 6.0  # 2+1+3
    assert c1["distinct_products"] == 2.0  # A, B
    assert c1["recent90_orders"] == 1.0  # I2 on 2011-05-20
    # avg of order amounts (I1: 2*5+1*10=20, I2: 15) = 17.5
    assert c1["avg_order_amount"] == pytest.approx(17.5)
    assert c1["recency_days"] == 23.0  # cutoff 6/12 - last order 5/20


def test_churned_customer_features(features):
    c2 = features["C2"]
    assert c2["label"] == 1.0  # silent after cutoff
    assert c2["total_orders"] == 2.0  # I4, I5 (dropped lines don't count)
    assert c2["total_qty"] == 3.0
    assert c2["recent90_orders"] == 1.0  # I5 on 2011-06-01


def test_log_features_consistent(features):
    import math

    c2 = features["C2"]
    total_amount = 1 * 5.0 + 2 * 10.0
    assert c2["total_amount_log"] == pytest.approx(math.log1p(total_amount))
    assert c2["recent90_amount_log"] == pytest.approx(math.log1p(20.0))
