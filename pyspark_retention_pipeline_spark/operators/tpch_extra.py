"""Additional TPC-H-shaped analytic queries (public TPC-H spec shapes adapted
to the testdata's columns — no partsupp table, so Q2/Q11/Q16/Q20 shapes are
out of scope). These widen the relational operator surface beyond the round-1
set with shapes the engine didn't yet cover:

  * dual-role dimension joins (the same dim table joined twice under
    different roles — Q7);
  * conditional-share-of-total ratios per group (Q8);
  * filtered top-k with dimension enrichment (Q10);
  * left-join count histograms (Q13);
  * argmax-by-global-max over an aggregate (Q15);
  * join-against-own-aggregate predicates (Q17);
  * HAVING-qualified order sets re-joined to their lines (Q18);
  * disjunctive multi-column predicate pushdown through a join (Q19);
  * scalar-subquery threshold + anti-join (Q22);
  * cross-role join predicates — customer nation = supplier nation (Q5);
  * pushdown-dominated filter + global aggregate (Q6);
  * 5-way star join with a substring part predicate (Q9, ADAPTED: no
    partsupp → the supply-cost term is out of scope, profit reduces to
    discounted revenue);
  * sole-late-supplier on multi-supplier orders (Q21, ADAPTED: no
    commit/receipt dates → lateness is ship > order + 90 days; the
    spec's EXISTS / NOT-EXISTS self-joins become two aggregations over
    one l_orderkey partitioning).

All money aggregates follow the cross-engine determinism rules from
``exprs``/``registry``: 2-decimal inputs use ``money_sum``, derived products
use exact ``scaled_sum``, quantities are integral doubles (sums exact in any
order), and every computed column is aliased identically in both engines.

Scale posture: ``nation``/``region`` (fixed-size) are broadcast; scaling
tables are pre-projected to the joined columns and AQE picks their join
strategy (see joins.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exprs import money_sum, scaled_sum, ts_lit
from ..registry import query
from ..tables import load_table

_SCALED_REV = (
    "SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))"
    " / CAST(10000 AS DOUBLE)"
)

_rev = lambda: F.col("l_extendedprice") * (1 - F.col("l_discount"))  # noqa: E731


@query(
    "volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS y,
           SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
             / CAST(10000 AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
    tags=("tpch-q7",),
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (public spec): trade volume between two nations by
    year. ``nation`` joins twice under different roles (supplier side and
    customer side) — both broadcast; the nation-pair filter applies after
    both roles resolve."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("o_orderdate").cast("long").alias("y"))
        .agg(scaled_sum(_rev()).alias("revenue"))
    )


@query(
    "market_share",
    oracle="""
    WITH base AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS y,
             CASE WHEN n1.n_name = 'NATION_3'
                  THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
                  ELSE 0 END AS nat_cents,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT) AS all_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT y,
           (SUM(nat_cents) / CAST(10000 AS DOUBLE))
             / (SUM(all_cents) / CAST(10000 AS DOUBLE)) AS mkt_share
    FROM base GROUP BY y
    """,
    tags=("tpch-q8",),
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (public spec): one supplier nation's share of yearly
    revenue to customers in one region — a conditional/total ratio computed
    from exact scaled-integer sums in a single aggregation (no second pass
    for the denominator)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_regionkey")
    )
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    cents = F.round(_rev() * 10000).cast("long")
    nat_cents = F.when(F.col("supp_nation") == "NATION_3", cents).otherwise(F.lit(0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("c_regionkey") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("y"))
        .agg(
            (
                (F.sum(nat_cents) / F.lit(10000.0)) / (F.sum(cents) / F.lit(10000.0))
            ).alias("mkt_share")
        )
    )


@query(
    "returned_items_top_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
             / CAST(10000 AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("tpch-q10",),
)
def returned_items_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (public spec): customers who returned the most revenue
    in a window — filter pushdown on both fact scans, aggregate at customer
    grain, TakeOrderedAndProject for the top-20 (key tie-break for
    determinism)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= ts_lit("1998-01-01 00:00:00"))
                & (F.col("o_orderdate") < ts_lit("1998-07-01 00:00:00"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(scaled_sum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS n_customers FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    tags=("tpch-q13",),
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (public spec): histogram of per-customer order counts
    — double aggregation with LEFT JOIN zero preservation (COUNT of the
    right-side key counts 0 for customers with no orders)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("n_customers"))


@query(
    "top_revenue_suppliers",
    oracle="""
    WITH srev AS (
      SELECT l.l_suppkey AS suppkey,
             SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
               / CAST(10000 AS DOUBLE) AS total_revenue
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1999-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM srev r JOIN supplier s ON r.suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM srev)
    """,
    tags=("tpch-q15",),
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (public spec): supplier(s) achieving the maximum
    windowed revenue. The scalar MAX subquery is a 1-row aggregate
    broadcast-cross-joined onto the supplier grain (the `idle_wealthy_customers`
    pattern) — no unpartitioned WindowExec, so the filter stays fully parallel
    no matter how large the supplier grain grows; equality on exact scaled
    sums is engine-deterministic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    srev = (
        li.filter(
            (F.col("l_shipdate") >= ts_lit("1999-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts_lit("1999-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(scaled_sum(_rev()).alias("total_revenue"))
    )
    mx = srev.agg(F.max("total_revenue").alias("_mx"))
    return (
        srev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(s, F.col("suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "small_qty_part_revenue",
    oracle="""
    SELECT SUM(CAST(ROUND(l.l_extendedprice * 10000) AS BIGINT))
             / CAST(10000 AS DOUBLE) / CAST(7 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_limit
      FROM lineitem GROUP BY l_partkey
    ) t ON l.l_partkey = t.l_partkey
    WHERE p.p_brand = 'Brand#12' AND l.l_quantity < t.qty_limit
    """,
    tags=("tpch-q17",),
)
def small_qty_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (public spec): revenue lost to small-quantity orders —
    a join against the table's OWN per-key aggregate. Quantities are integral
    doubles, so AVG is exact and order-independent on both engines; the
    aggregate side carries only (key, limit) through the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    limits = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit")
    )
    brand_parts = p.filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    return (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(brand_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(limits, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            (scaled_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
        )
    )


@query(
    "disjunctive_part_predicates",
    oracle="""
    SELECT SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
             / CAST(10000 AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch-q19",),
)
def disjunctive_part_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (public spec): OR-of-conjunct predicates spanning both
    join sides. Catalyst extracts the common per-side conjuncts (brand IN /
    size / quantity ranges) below the join, so both scans still prune."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((brand == "Brand#12") & size.between(1, 15) & qty.between(1, 20))
        | ((brand == "Brand#23") & size.between(10, 30) & qty.between(10, 30))
        | ((brand == "Brand#34") & size.between(20, 50) & qty.between(20, 40))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(scaled_sum(_rev()).alias("revenue"), F.count("*").alias("n_lines"))
    )


@query(
    "idle_wealthy_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / CAST(100 AS DOUBLE)
               / COUNT(*) AS threshold
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, COUNT(*) AS n_custs,
           ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.threshold
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
    tags=("tpch-q22",),
)
def idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (public spec): above-average-balance customers with no
    orders, by nation. The scalar AVG threshold is an exact scaled-integer
    mean (order-independent, engine-identical) broadcast-cross-joined onto
    the rows; the NOT EXISTS is a LEFT ANTI join on distinct order keys."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    o_keys = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    threshold = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
                / F.lit(100.0)
                / F.count("*")
            ).alias("threshold")
        )
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(o_keys, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_custs"), money_sum("c_acctbal").alias("total_bal"))
    )


@query(
    "large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150.0
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN big b ON b.l_orderkey = o.o_orderkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    tags=("tpch-q18",),
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL TPC-H Q18 (public spec): the complete customer/orders/lineitem
    form — where ``large_volume_orders`` (joins.py) covers only the HAVING
    subquery core, this re-joins the qualifying order set back to LINEITEM
    and aggregates over the customer-enriched grain, the part of Q18 that
    stresses shuffle reuse: the qualifying set is an aggregate on lineitem's
    natural grouping key (map-side combinable, carries only orderkeys) and
    the re-join to lineitem and orders runs on that same key, so both
    lineitem passes share one partitioning; customer joins last on the
    already-reduced row set. Quantities are integral doubles, so their sums
    are exact in any order.

    fan_out examined and REJECTED twice (rounds 15 and 16): the round-16
    order-alternating quiet-host adjudication was decisive against it (off
    best 1.14 / med 1.24 vs fanned 1.90 / 2.09, fanned ahead 0/8 — the
    repartition breaks the l_orderkey shuffle-reuse this query's shape
    exists to exercise)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 150.0)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(big, "l_orderkey")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )


@query(
    "local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           {_SCALED_REV} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = 1996
    GROUP BY n.n_name
    """,
    tags=("tpch-q5",),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (public spec): revenue from orders where the customer
    and the line's supplier share a nation, per nation of one region. The
    distinctive feature is the NON-key join condition ``c_nationkey =
    s_nationkey`` riding on the supplier equi-join — a join predicate
    across two different dimension roles. nation/region broadcast; the
    region + year filters reach the dimension/orders scans."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    ).filter(F.year("o_orderdate") == 1996)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(scaled_sum(_rev()).alias("revenue"))
    )


@query(
    "forecast_revenue_discount",
    oracle="""
    SELECT SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT))
             / CAST(10000 AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE year(l_shipdate) = 1996
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch-q6",),
)
def forecast_revenue_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (public spec): revenue increase if small-quantity
    discounts were dropped — a pure filter + global aggregate, the query
    that lives or dies on predicate pushdown and column pruning (3 of 11
    lineitem columns read, all three predicates in PushedFilters). The
    price×discount product sums via exact scaled integers."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.year("l_shipdate") == 1996)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            scaled_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS y,
           {_SCALED_REV} AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    tags=("tpch-q9",),
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape, ADAPTED: the testdata has no partsupp table, so the
    ``ps_supplycost * l_quantity`` term of true Q9 profit is out of scope
    (module docstring) and profit reduces to discounted revenue — the
    SHAPE retained is the 5-way star join fanned from lineitem with a
    substring predicate on the part name, grouped by supplier nation ×
    order year. The part filter prunes before the join (LIKE reaches the
    part scan); nation broadcasts; everything else AQE."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name").filter(
        F.col("p_name").contains("widget")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("y"),
        )
        .agg(scaled_sum(_rev()).alias("profit"))
    )


@query(
    "waiting_suppliers",
    oracle="""
    WITH tagged AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate) > 90 AS INT)
               AS late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ), per_supp AS (
      SELECT l_orderkey, l_suppkey, MAX(late) AS supp_late
      FROM tagged GROUP BY 1, 2
    ), per_order AS (
      SELECT l_orderkey,
             COUNT(*) AS n_supp,
             CAST(SUM(supp_late) AS BIGINT) AS n_late
      FROM per_supp GROUP BY 1
    )
    SELECT s.s_name, n.n_name AS nation, COUNT(*) AS numwait
    FROM per_supp ps
    JOIN per_order po ON ps.l_orderkey = po.l_orderkey
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE ps.supp_late = 1 AND po.n_supp >= 2 AND po.n_late = 1
    GROUP BY 1, 2
    """,
    tags=("tpch-q21",),
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape, ADAPTED: suppliers who were the SOLE late supplier
    on a finished multi-supplier order (no l_commitdate/l_receiptdate in
    the testdata, so "late" is ship > order date + 90 days). The spec
    writes this as EXISTS + NOT-EXISTS self-joins over lineitem; the
    Spark-first form aggregates lineitem ONCE to (order, supplier,
    late-flag) grain, derives per-order supplier/late counts from that
    same frame, and filters — two aggregations sharing one l_orderkey
    partitioning instead of three passes over the fact table, with the
    EXISTS ("another supplier") and NOT-EXISTS ("no other late supplier")
    becoming ``n_supp >= 2 AND n_late = 1``. The oracle mirrors the
    aggregate form, so parity also certifies the rewrite."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    ).filter(F.col("o_orderstatus") == "F")
    tagged = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.datediff("l_shipdate", "o_orderdate") > 90).cast("int").alias("late"),
    )
    per_supp = tagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("supp_late").cast("long").alias("n_late"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        per_supp.filter(F.col("supp_late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(s, per_supp.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("numwait"))
    )
