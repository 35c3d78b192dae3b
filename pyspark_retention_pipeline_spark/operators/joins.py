"""Join operators (SURVEY.md §2.3, J1-J4) with explicit physical hints.

Only genuinely fixed-size dimensions (``nation`` 25 rows, ``region`` 5 rows)
carry ``F.broadcast`` hints — at 100 TB the fact side never shuffles for
these joins. Tables that scale with SF (customer, part, orders, lineitem)
get NO hint: a forced broadcast of a scaling table OOMs executors at 100×,
while AQE broadcasts them automatically whenever their actual size is under
``spark.sql.autoBroadcastJoinThreshold`` and falls back to shuffled joins
otherwise. Semi/anti joins are expressed as ``left_semi`` / ``left_anti``
(no payload columns cross the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import CUTOFF, LOOKAHEAD_END
from ..exprs import money_sum, ts_lit
from ..registry import query
from ..tables import load_table


@query(
    "left_join_enrich",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    tags=("J1", "J2"),
)
def left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dimension enrichment via broadcast left joins (reference
    ``pipeline/etl.py:84,96`` attaches per-customer aggregates the same way)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )


@query(
    "label_antijoin",
    oracle=f"""
    WITH hist AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      WHERE o_orderdate <= TIMESTAMP '{CUTOFF}'
    ), fut AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      WHERE o_orderdate > TIMESTAMP '{CUTOFF}'
        AND o_orderdate <= TIMESTAMP '{LOOKAHEAD_END}'
    )
    SELECT h.custkey,
           CASE WHEN f.custkey IS NULL THEN CAST(1 AS DOUBLE)
                ELSE CAST(0 AS DOUBLE) END AS label
    FROM hist h LEFT JOIN fut f ON h.custkey = f.custkey
    """,
    tags=("J3",),
)
def label_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The churn-label semi-join pattern (reference ``pipeline/etl.py:121-124``:
    left join to lookahead buyers, absent ⇒ churned)."""
    o = load_table(spark, sf_dir, "orders")
    hist = (
        o.filter(F.col("o_orderdate") <= ts_lit(CUTOFF))
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    fut = (
        o.filter(
            (F.col("o_orderdate") > ts_lit(CUTOFF))
            & (F.col("o_orderdate") <= ts_lit(LOOKAHEAD_END))
        )
        .select(F.col("o_custkey").alias("fut_custkey"))
        .distinct()
    )
    return (
        hist.join(fut, hist.custkey == fut.fut_custkey, "left")
        .select(
            "custkey",
            F.when(F.col("fut_custkey").isNull(), 1.0).otherwise(0.0).alias("label"),
        )
    )


@query(
    "churned_customers",
    oracle=f"""
    SELECT DISTINCT h.o_custkey AS custkey
    FROM orders h
    WHERE h.o_orderdate <= TIMESTAMP '{CUTOFF}'
      AND NOT EXISTS (
        SELECT 1 FROM orders f
        WHERE f.o_custkey = h.o_custkey
          AND f.o_orderdate > TIMESTAMP '{CUTOFF}'
          AND f.o_orderdate <= TIMESTAMP '{LOOKAHEAD_END}'
      )
    """,
    tags=("J3", "anti"),
)
def churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join form of the churn label — only keys cross the shuffle,
    the cheapest way to materialize just the churned cohort."""
    o = load_table(spark, sf_dir, "orders")
    hist = (
        o.filter(F.col("o_orderdate") <= ts_lit(CUTOFF))
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    fut = o.filter(
        (F.col("o_orderdate") > ts_lit(CUTOFF)) & (F.col("o_orderdate") <= ts_lit(LOOKAHEAD_END))
    ).select(F.col("o_custkey").alias("custkey"))
    return hist.join(fut, "custkey", "left_anti")


@query(
    "active_customers_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("J-semi",),
)
def active_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — EXISTS without duplicating or carrying right-side
    columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_semi").select("c_custkey", "c_name")


@query(
    "revenue_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           ROUND(SUM(o.o_totalprice), 2) AS revenue,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate <= TIMESTAMP '{CUTOFF}'
    GROUP BY n.n_name
    """,
    tags=("J1", "headline"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join star aggregation (TPC-H Q5 shape, public spec). ``nation``
    (25 rows, fixed) is broadcast; ``customer`` scales with SF, so it gets no
    hint — pre-projected to its two needed columns, AQE broadcasts it at small
    SF and falls back to a shuffled join at scale instead of OOMing."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.filter(F.col("o_orderdate") <= ts_lit(CUTOFF))
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(money_sum("o_totalprice").alias("revenue"), F.count("*").alias("n_orders"))
    )


@query(
    "union_by_name",
    oracle="""
    SELECT key, name FROM (
      SELECT c_custkey AS key, c_name AS name FROM customer
      UNION ALL
      SELECT s_suppkey AS key, s_name AS name FROM supplier
    )
    """,
    tags=("set-op",),
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union (SURVEY §2.7 lists unionByName as the utility
    set-op the engine carries)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.col("s_name").alias("name")
    )
    return c.unionByName(s)


@query(
    "shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey, o.o_orderdate,
           SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
             / CAST(10000 AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '{CUTOFF}'
      AND l.l_shipdate > TIMESTAMP '{CUTOFF}'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("tpch-q3", "headline"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (public spec): segment-filtered 3-way join, revenue per
    undelivered order, top 10. The customer side reduces to a key set before
    the join (semi-join pattern); exact scaled revenue keeps the ORDER BY
    deterministic across engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    from ..exprs import scaled_sum

    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        o.filter(F.col("o_orderdate") < ts_lit(CUTOFF))
        .join(building, o.o_custkey == building.c_custkey, "left_semi")
        .join(li.filter(F.col("l_shipdate") > ts_lit(CUTOFF)), o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(scaled_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "large_volume_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           ROUND(t.total_qty, 2) AS total_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150
    ) t ON o.o_orderkey = t.l_orderkey
    """,
    tags=("tpch-q18",),
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (public spec): orders whose line quantities exceed a
    threshold — aggregate-then-join (the HAVING subquery); the aggregated
    side carries only (key, qty) through the join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_custkey", "o_totalprice", F.round("total_qty", 2).alias("total_qty")
    )


@query(
    "late_shipping_priority_check",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o.o_orderpriority
    """,
    tags=("tpch-q4",),
)
def late_shipping_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (public spec): correlated EXISTS with a cross-table
    predicate (a line shipped after its order date) as a LEFT SEMI join
    carrying the extra condition — no duplication, keys-plus-predicate only
    across the exchange."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    exists = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return exists.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@query(
    "priority_line_distribution",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY l.l_returnflag
    """,
    tags=("tpch-q12",),
)
def priority_line_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (public spec): join + CASE-bucketed conditional counts
    (the IN-list predicate folded into the aggregation)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(100 AS DOUBLE)
             * (SUM(CASE WHEN p.p_size > 25
                         THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
                         ELSE 0 END) / CAST(10000 AS DOUBLE))
             / (SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
                / CAST(10000 AS DOUBLE)) AS promo_share_pct,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    tags=("tpch-q14",),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (public spec): revenue share of a part class — a
    conditional/total ratio in ONE aggregation over a part join; both sums
    exact-scaled so the ratio is engine-identical. ``part`` scales with SF,
    so no broadcast hint — AQE decides; only the two needed part columns
    reach the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_size")
    rev_cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
        "long"
    )
    promo = F.col("p_size") > 25
    joined = li.join(p, li.l_partkey == p.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * (F.sum(F.when(promo, rev_cents).otherwise(0)) / F.lit(10000.0))
            / (F.sum(rev_cents) / F.lit(10000.0))
        ).alias("promo_share_pct"),
        F.count("*").alias("n_lines"),
    )


@query(
    "supplier_balance_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_suppliers,
           ROUND(SUM(s.s_acctbal), 2) AS total_balance
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("dim-join",),
)
def supplier_balance_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier dimension rollup (completes coverage of every testdata
    table through at least one oracle-checked query)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_balance"),
        )
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: fact rows get a salt in [0, n_salts) and the
    dim side is replicated once per salt, so each hot key's rows spread over
    ``n_salts`` shuffle partitions instead of hammering one reducer.

    AQE's OptimizeSkewedJoin handles most skew automatically by splitting
    oversized partitions (demonstrated in tests/test_plans.py); manual
    salting remains the tool when AQE can't apply — e.g. the skewed join
    feeds a co-partitioned downstream stage, or the engine runs with AQE off.
    The salt assignment is per-row nondeterministic (rand); correctness is
    unaffected because the dim side carries every salt value.

    ``how`` is restricted to fact-preserving join types: under right/full
    outer joins each UNMATCHED dim row would surface once per salt replica
    (n_salts copies after ``_salt`` is dropped) — silently wrong results, so
    those types raise instead.
    """
    # Normalize the same way Spark's JoinType.apply does (lowercase, drop
    # underscores) so every alias Spark itself accepts for a fact-preserving
    # type ("leftouter", "semi", "leftsemi", "anti", "leftanti") passes.
    allowed = {"inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-safe — the dim side is "
            f"replicated per salt, so unmatched dim rows would appear "
            f"{n_salts}x under right/full outer joins; use one of {sorted(allowed)}"
        )
    salted_fact = fact.withColumn(
        "_salt", (F.rand(42) * n_salts).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(salted_dim, [key, "_salt"], how).drop("_salt")


@query(
    "skew_salted_segment_counts",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("skew", "salted-join"),
)
def skew_salted_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈customer through the salted-join path, proving the salt
    replication changes the physical distribution but not the result (the
    oracle is the plain join)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(o, c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_orders"),
        money_sum("o_totalprice").alias("revenue"),
    )
