"""TPC-H-style analytical queries over the driver's star schema.

The reference has no SQL surface at all (SURVEY.md §0); these queries prove
the batch-analytics side of the engine — multi-way joins, broadcast dims,
grouped aggregation, top-N — which Catalyst plans with broadcast/SMJ + AQE.

Float determinism: all money aggregates are summed as DECIMAL (exact and
order-independent) and cast to DOUBLE at the end, so the DuckDB oracle
hash-matches bit-for-bit. See registry.py conventions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_flink_spark.io import table
from data_warehouse_flink_spark.registry import register


def _dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,6)")


# --------------------------------------------------------------------------
# Q1: pricing summary report — scan-heavy grouped aggregation.
# --------------------------------------------------------------------------
@register(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: 8 aggregates over lineitem grouped by two flags."""
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp")
    )
    disc_factor = ((F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,6)")
    charge_factor = (
        (F.lit(1.0) - F.col("l_discount")) * (F.lit(1.0) + F.col("l_tax"))
    ).cast("decimal(18,6)")
    n = F.count("*")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
        F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias(
            "sum_base_price"
        ),
        F.round(F.sum(_dec("l_extendedprice") * disc_factor), 2).cast("double")
        .alias("sum_disc_price"),
        F.round(F.sum(_dec("l_extendedprice") * charge_factor), 2).cast("double")
        .alias("sum_charge"),
        F.round(F.sum(_dec("l_quantity")).cast("double") / n, 6).alias("avg_qty"),
        F.round(F.sum(_dec("l_extendedprice")).cast("double") / n, 6).alias(
            "avg_price"
        ),
        F.round(F.sum(_dec("l_discount")).cast("double") / n, 6).alias("avg_disc"),
        n.alias("count_order"),
    )


# --------------------------------------------------------------------------
# Q3: shipping priority — 3-way join + grouped revenue + top-10.
# --------------------------------------------------------------------------
@register(
    "tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                    * CAST(1 - l.l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS revenue,
           epoch(o.o_orderdate)::BIGINT AS orderdate_sec,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: top-10 open orders by revenue in one segment."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.round(
        F.sum(
            _dec("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,6)")
        ),
        2,
    ).cast("double")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("orderdate_sec"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5: local supplier volume — 6-way join with broadcast dims.
# --------------------------------------------------------------------------
@register(
    "tpch_q5",
    oracle="""
    SELECT n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                    * CAST(1 - l.l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation for intra-nation (customer=supplier nation) trade."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.round(
        F.sum(
            _dec("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,6)")
        ),
        2,
    ).cast("double")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q6: forecasting revenue change — pure scan + filter + single agg.
# --------------------------------------------------------------------------
@register(
    "tpch_q6",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from discounted small-quantity lineitems in one year."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
            .cast("double")
            .alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Order priority distribution (Q4-flavored, no EXISTS needed by the schema).
# --------------------------------------------------------------------------
@register(
    "order_priority_count",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY 1
    """,
)
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: orders with at least one late-shipped lineitem, by priority.

    The EXISTS becomes a LEFT SEMI join — Catalyst's native form; no
    row explosion from multiple matching lineitems.

    r14 (guide §3.2/§2.3): two reductions of the fact side before the
    join. (a) The implied filter `l_shipdate > '1996-01-01'` is applied
    explicitly — every order in the window has o_orderdate >= 1996-01-01,
    so an earlier-shipped lineitem can never satisfy
    `l_shipdate > o_orderdate`; the predicate pushes to the parquet scan.
    (b) EXISTS(l_shipdate > o_orderdate) over an order's lineitems equals
    `max(l_shipdate) > o_orderdate`, so lineitem pre-aggregates to one
    (l_orderkey, max_ship) row per key — partial aggregation runs
    map-side and the join side shrinks from every lineitem row to one row
    per order at any scale."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    lmax = (
        table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
        )
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    semi = o.join(
        lmax,
        on=[o.o_orderkey == lmax.l_orderkey, lmax.max_ship > o.o_orderdate],
        how="left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --------------------------------------------------------------------------
# Q10: returned-item reporting — join + group + top-20 customers.
# --------------------------------------------------------------------------
@register(
    "tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                    * CAST(1 - l.l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS revenue,
           CAST(ROUND(CAST(c.c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS acctbal,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returned items in one quarter."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    revenue = F.round(
        F.sum(
            _dec("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,6)")
        ),
        2,
    ).cast("double")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal").cast("decimal(18,6)"), 2)
            .cast("double")
            .alias("acctbal"),
            "n_name",
        )
        .agg(revenue.alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q14: promotion effect — conditional aggregation over a part join.
# --------------------------------------------------------------------------
@register(
    "tpch_q14",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,6))
                      * CAST(1 - l.l_discount AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                 * CAST(1 - l.l_discount AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from PROMO parts in one month."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = _dec("l_extendedprice") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,6)")
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# Q18: large-volume customers — agg-filtered semi join (HAVING subquery).
# --------------------------------------------------------------------------
@register(
    "tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY 1 HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           epoch(o.o_orderdate)::BIGINT AS orderdate_sec,
           CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE)
             AS totalprice,
           CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with orders whose total quantity exceeds 150."""
    # ONE lineitem pass: the HAVING filter and the output sum come from the
    # same per-order aggregate (the textbook form re-joins lineitem and
    # re-aggregates — a second full scan of the fact table for a value the
    # first aggregate already holds)
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("q"),
            F.round(F.sum(_dec("l_quantity")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
        .filter(F.col("q") > 150)
    )
    orders = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(c, orders.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_sec"),
            F.round(F.col("o_totalprice").cast("decimal(18,6)"), 2)
            .cast("double")
            .alias("totalprice"),
            "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# Q19: discounted revenue — OR-of-ANDs predicate over a part join.
# --------------------------------------------------------------------------
@register(
    "tpch_q19",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                 * CAST(1 - l.l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under a disjunction of brand/size/quantity conditions."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    s = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#3") & s.between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#5") & s.between(20, 50) & q.between(20, 40))
    )
    disc = _dec("l_extendedprice") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,6)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(disc), 2).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q7: volume shipping between two nations — direction-keyed join agg.
# --------------------------------------------------------------------------
@register(
    "tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(strftime(l.l_shipdate, '%Y') AS BIGINT) AS l_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                    * CAST(1 - l.l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume between two nations by year."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.round(
        F.sum(
            _dec("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,6)")
        ),
        2,
    ).cast("double")
    joined = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.date_format("l_shipdate", "yyyy").cast("long").alias("l_year"),
    ).agg(revenue.alias("revenue"))


# --------------------------------------------------------------------------
# Q8: market share of one nation within a region for a part type.
# --------------------------------------------------------------------------
@register(
    "tpch_q8",
    oracle="""
    WITH base AS (
      SELECT CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,6))
               * CAST(1 - l.l_discount AS DECIMAL(18,6)) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM base GROUP BY 1
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHINA's share of ASIA-customer PROMO-part volume per year."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), "n_regionkey"
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = _dec("l_extendedprice") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,6)")
    # r14 negative result, measured and reverted: pre-filtering customer
    # to the ASIA slice through the broadcast nation→region dims BEFORE
    # the fact join looked like a §2.3 win, but the join-derived size
    # estimate pushed the (o ⨝ c_asia) join from auto-broadcast to an
    # initial-plan SortMergeJoin that AQE did not recover — measured
    # 0.89 → 1.24 s on a quiet box. At this tier every q8 join is
    # broadcast (zero fact exchanges); at 100 TB the customer join flips
    # to SMJ by size either way, and the late region filter rides the
    # same exchange. Keeping the flat broadcast chain.
    base = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.date_format("o_orderdate", "yyyy").cast("long").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    china = F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(china).cast("double") / F.sum("volume").cast("double"), 6
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue — correlated aggregate subquery.
# --------------------------------------------------------------------------
@register(
    "tpch_q17",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS threshold
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))), 2)
                AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < a.threshold
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to small-quantity orders of one brand (correlated-avg
    subquery → join against a per-part aggregate)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    # correlated avg as a per-part window over the brand-pruned rows: the
    # per-part mean is unchanged by pruning other parts, and lineitem is
    # scanned once instead of once per consumer
    from pyspark.sql import Window

    filtered = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    threshold = F.lit(0.2) * F.avg("l_quantity").over(
        Window.partitionBy("l_partkey")
    )
    return (
        filtered.withColumn("threshold", threshold)
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (
                F.round(F.sum(_dec("l_extendedprice")), 2).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q13: customer order-count distribution — left join + double aggregation.
# --------------------------------------------------------------------------
@register(
    "tpch_q13",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '5-LOW'
      GROUP BY 1
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust GROUP BY 1
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-customer order counts (left join keeps
    zero-order customers; double aggregation)."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q22: global-sales opportunity — scalar subquery + anti join.
# --------------------------------------------------------------------------
@register(
    "tpch_q22",
    oracle="""
    WITH avg_bal AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS s,
             count(*) AS n
      FROM customer WHERE c_acctbal > 0
    ), rich_idle AS (
      SELECT c.c_custkey, c.c_nationkey % 5 AS cntrycode, c.c_acctbal
      FROM customer c CROSS JOIN avg_bal
      WHERE CAST(c.c_acctbal AS DECIMAL(18,6)) * avg_bal.n > avg_bal.s
        AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    )
    SELECT cntrycode, count(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS totacctbal
    FROM rich_idle GROUP BY 1
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no orders, by country code
    (scalar subquery + anti join).

    The average threshold stays in the decimal domain as a cross-multiplied
    compare (bal × n > Σbal) — a DOUBLE avg() is summation-order dependent,
    so a boundary-balance customer could pass in one engine and fail in the
    other at larger scale factors."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).alias("s"),
            F.count("*").alias("n"),
        )
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal").cast("decimal(18,6)") * F.col("n") > F.col("s")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy(
        (F.col("c_nationkey") % 5).alias("cntrycode")
    ).agg(
        F.count("*").alias("numcust"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("totacctbal"),
    )

# --------------------------------------------------------------------------
# Q2 (adapted): minimum-cost supplier — correlated scalar-min subquery.
# No partsupp table in this schema; lineitem's (l_partkey, l_suppkey) pairs
# are the part↔supplier relation and min(l_extendedprice) per pair stands in
# for ps_supplycost (pure selection, no arithmetic → cross-engine exact).
# --------------------------------------------------------------------------
@register(
    "tpch_q2",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
      FROM lineitem GROUP BY 1, 2
    ), rs AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ), reg AS (
      SELECT p.p_partkey, p.p_name, rs.s_suppkey, rs.s_name, rs.s_acctbal,
             rs.n_name, ps.cost
      FROM ps
      JOIN rs ON ps.l_suppkey = rs.s_suppkey
      JOIN part p ON ps.l_partkey = p.p_partkey
      WHERE p.p_size = 15 AND p.p_type = 'SMALL'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
    FROM reg w
    WHERE cost = (SELECT min(cost) FROM reg r2
                  WHERE r2.p_partkey = w.p_partkey)
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest regional supplier per part (correlated min subquery →
    join against a per-part min aggregate; reference shape TPC-H Q2).

    r14 (guide §3.2): lineitem is SEMI-FILTERED through the two broadcast
    dimension key sets BEFORE the (l_partkey, l_suppkey) aggregation. The
    part filter (p_size=15 AND p_type='SMALL') and the EUROPE supplier
    slice are both highly selective, and min-per-key over key-filtered
    rows equals min-per-key over all rows for every surviving key (the
    post-agg inner joins drop the rest anyway) — so the big keyed exchange
    shrinks by the dimension selectivity instead of aggregating the whole
    fact table first."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    rs = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    ).select("p_partkey", "p_name")
    li = table(spark, sf_dir, "lineitem")
    li = li.join(
        F.broadcast(p.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    li = li.join(
        F.broadcast(rs.select("s_suppkey")),
        li.l_suppkey == F.col("s_suppkey"),
        "left_semi",
    )
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    reg = (
        ps.join(F.broadcast(rs), ps.l_suppkey == rs.s_suppkey)
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
    )
    # correlated min as a per-part window min: one pass over `reg` (the
    # groupBy+self-join form recomputes the lineitem aggregation twice),
    # one shuffle keyed by p_partkey — same exchange the agg would need
    from pyspark.sql import Window

    min_cost = F.min("cost").over(Window.partitionBy("p_partkey"))
    return (
        reg.withColumn("min_cost", min_cost)
        .filter(F.col("cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost")
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q9 (adapted): product-type profit by nation and year. ps_supplycost is
# absent; cost = p_retailprice × l_quantity (decimal domain throughout).
# --------------------------------------------------------------------------
@register(
    "tpch_q9",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS o_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                    * CAST(1 - l.l_discount AS DECIMAL(18,6))
                    - CAST(p.p_retailprice AS DECIMAL(18,6))
                    * CAST(l.l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on red parts by supplier nation and order year (5-way join +
    substring filter; reference shape TPC-H Q9)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = table(spark, sf_dir, "nation")
    profit = _dec("l_extendedprice") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,6)") - _dec("p_retailprice") * _dec("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q11 (adapted): important stock value — HAVING against a scalar subquery.
# Value of a part in one nation's supply = Σ extendedprice × quantity over
# lineitem. Threshold compare runs on identically-derived doubles from
# exact decimal sums, so both engines decide every boundary identically.
# --------------------------------------------------------------------------
@register(
    "tpch_q11",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(12,6))
               * CAST(l.l_quantity AS BIGINT)) AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY 1
    ), tot AS (SELECT SUM(v) AS t FROM val)
    SELECT l_partkey AS p_partkey, CAST(ROUND(v, 2) AS DOUBLE) AS value
    FROM val CROSS JOIN tot
    WHERE CAST(ROUND(v, 2) AS DOUBLE) > CAST(ROUND(t, 2) AS DOUBLE) / 10000.0
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose stock value in one nation exceeds 1/10000 of the total
    (group-by + scalar-subquery HAVING; reference shape TPC-H Q11)."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    # (12,6)x(8,6): wide enough for the data, narrow enough that the
    # oracle's int128 decimal multiply cannot overflow
    # quantity is integral; multiplying by BIGINT keeps the product in
    # the oracle's int128 decimal path (a (12,6)x(8,6) multiply gets capped
    # to DECIMAL(18,12) there and overflows)
    v = F.col("l_extendedprice").cast("decimal(12,6)") * F.col(
        "l_quantity"
    ).cast("long")
    val = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(v).alias("v"))
    )
    # val feeds both the grand total and the threshold filter; materialize
    # the small per-part aggregate once (single lineitem scan)
    val = val.localCheckpoint(eager=True)
    tot = val.agg(F.sum("v").alias("t"))
    vd = F.round(F.col("v"), 2).cast("double")
    td = F.round(F.col("t"), 2).cast("double")
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(vd > td / F.lit(10000.0))
        .select(
            F.col("l_partkey").alias("p_partkey"), vd.alias("value")
        )
    )


# --------------------------------------------------------------------------
# Q12 (adapted): late-shipment priority split. No l_shipmode/l_receiptdate:
# "late" = shipped >60 days after order date; l_linestatus stands in for
# the shipmode grouping; conditional counts are the Q12 CASE aggregates.
# --------------------------------------------------------------------------
@register(
    "tpch_q12",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late 1997 shipments split into high/low order priority per line
    status (join + CASE-conditional aggregation; reference shape Q12)."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q15: top supplier by quarterly revenue — view + scalar-max subquery.
# Fully expressible in this schema (revenue from lineitem alone).
# --------------------------------------------------------------------------
@register(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                      * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM revenue r JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum Q1-1997 revenue (revenue view + scalar
    max; reference shape TPC-H Q15). Exact decimal revenue rounded before
    the max-equality so both engines pick identical winners."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,6)")
            ),
            2,
        )
        .cast("double")
        .alias("total_revenue")
    )
    # rev is consumed twice (scalar max + the winner join); materialize the
    # small per-supplier aggregate once so lineitem is scanned once — Spark
    # does not reuse the exchange across the two consumers
    rev = rev.localCheckpoint(eager=True)
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q16 (adapted): supplier diversity per part attribute combo. partsupp →
# distinct (l_partkey, l_suppkey); "complaints" exclusion → s_acctbal < 0.
# --------------------------------------------------------------------------
@register(
    "tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'ECONOMY'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count of qualifying suppliers per (brand, type, size) excluding
    flagged suppliers (distinct-pair join + NOT-IN subquery + count
    distinct; reference shape TPC-H Q16).

    r14 (guide §2.4): the explicit `.distinct()` on the full
    (l_partkey, l_suppkey) projection — a whole-fact keyed exchange
    BEFORE the selective part join — is dropped: the downstream
    `count_distinct(l_suppkey)` already deduplicates (map-side partial
    distinct on (brand, type, size, suppkey)), so the oracle's
    DISTINCT-subquery semantics are preserved while the only exchange
    left carries the part-filtered, partially-deduped pairs."""
    pairs = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .join(
            F.broadcast(flagged),
            pairs.l_suppkey == flagged.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q20 (adapted): suppliers with outsized share of a part's flow. No
# ps_availqty: a supplier qualifies when its 1997 shipped quantity of a red
# part exceeds 20% of that part's total 1997 flow (nested IN + correlated
# share threshold; threshold compared on identically-derived doubles).
# --------------------------------------------------------------------------
@register(
    "tpch_q20",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2
    ), pt AS (
      SELECT l_partkey, SUM(q) AS qp FROM sp GROUP BY 1
    ), eligible AS (
      SELECT sp.l_suppkey
      FROM sp
      JOIN pt ON sp.l_partkey = pt.l_partkey
      JOIN part p ON p.p_partkey = sp.l_partkey
      WHERE p.p_name LIKE 'red%'
        AND CAST(ROUND(sp.q, 2) AS DOUBLE)
              > 0.2 * CAST(ROUND(pt.qp, 2) AS DOUBLE)
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM eligible)
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping >20% of any red part's 1997 flow (nested IN
    subqueries over per-(supplier, part) and per-part aggregates;
    reference shape TPC-H Q20)."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    # red-part pruning pushes below BOTH aggregates (per-part totals are
    # unaffected by dropping other parts), and the per-part total is a
    # window over the per-(supplier, part) aggregate — one lineitem scan,
    # pre-filtered by the broadcast part list, instead of two full scans
    from pyspark.sql import Window

    red = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    sp = (
        l.join(F.broadcast(red), l.l_partkey == red.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
    )
    qd = F.round(F.col("q"), 2).cast("double")
    qpd = F.round(F.col("qp"), 2).cast("double")
    eligible = (
        sp.withColumn("qp", F.sum("q").over(Window.partitionBy("l_partkey")))
        .filter(qd > F.lit(0.2) * qpd)
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    return s.join(
        eligible, s.s_suppkey == eligible.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# --------------------------------------------------------------------------
# Q21 (adapted): suppliers who kept orders waiting. No l_receiptdate /
# l_commitdate: "late" = shipped >60 days after the order date. A supplier
# waits an order when it shipped late, another supplier participated, and
# no OTHER supplier was late — EXISTS + NOT EXISTS, the multi-anti-join
# shape nothing else in the registry exercises.
# --------------------------------------------------------------------------
@register(
    "tpch_q21",
    oracle="""
    WITH late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late w
    JOIN supplier s ON s.s_suppkey = w.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = w.l_orderkey
          AND l2.l_suppkey <> w.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = w.l_orderkey
          AND l3.l_suppkey <> w.l_suppkey)
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sole-late suppliers of finished multi-supplier orders (reference
    shape TPC-H Q21).

    The oracle keeps the textbook EXISTS + NOT-EXISTS correlated-subquery
    form; here both subqueries collapse into one per-orderkey aggregation —
    "no OTHER late supplier" ⇔ the order has exactly one distinct late
    supplier, "another supplier participated" ⇔ the order has >1 distinct
    suppliers overall. That turns two self-joins with inequality conditions
    (each a full extra shuffle + a distinct over the fact table) into two
    partial-aggregated groupBys and a single orderkey-equi join, which is
    the plan that survives 100 TB: shuffle volume is one row per orderkey,
    never a pair blow-up, and no non-equi join falls back to BNLJ.

    r14: the two count_distincts are computed via an explicit
    (l_orderkey, l_suppkey) pre-aggregation instead of Spark's
    Expand-based multi-distinct rewrite. Expand streamed THREE copies of
    every joined lineitem row (gid 0/1/2) into the first HashAggregate
    and shuffled the tripled, 4-part-keyed result; the pre-agg dedups
    (orderkey, suppkey) pairs map-side at 1x rows and carries one
    boolean (`any_late` = max of the late flag) per pair — the same two
    exchanges, ~3x fewer rows/bytes through the first one. Null
    semantics are preserved exactly: count_distinct ignores NULL
    suppkeys, so both counts gate on `l_suppkey IS NOT NULL`; a
    NULL late flag (NULL shipdate/orderdate) aggregates through max()
    the same way count_distinct(CASE WHEN late THEN suppkey END)
    ignores it — false-or-null `any_late` contributes to neither
    n_late nor late_suppkey."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    # ONE lineitem pass: the inner join restricts to 'F' orders (exactly the
    # orders the result can contain), then the per-orderkey distinct counts
    # come from an explicit (orderkey, suppkey) pre-aggregation — map-side
    # pair dedup at 1x rows instead of the optimizer's 3x-row Expand.
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("any_late"))
    )
    sole_late = (
        pairs.groupBy("l_orderkey")
        .agg(
            # count_distinct semantics: NULL suppkeys are never counted.
            F.count(
                F.when(F.col("l_suppkey").isNotNull(), True)
            ).alias("n_supp"),
            F.count(
                F.when(
                    F.col("any_late") & F.col("l_suppkey").isNotNull(), True
                )
            ).alias("n_late"),
            # With n_late == 1 the min IS the sole late supplier.
            F.min(
                F.when(F.col("any_late"), F.col("l_suppkey"))
            ).alias("late_suppkey"),
        )
        .filter((F.col("n_late") == 1) & (F.col("n_supp") > 1))
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(s), sole_late.late_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
