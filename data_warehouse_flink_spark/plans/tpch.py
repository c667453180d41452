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
    """
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    semi = o.join(
        l,
        on=[o.o_orderkey == l.l_orderkey, l.l_shipdate > o.o_orderdate],
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
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders")
    o = orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
    c = table(spark, sf_dir, "customer")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_sec"),
            F.round(F.col("o_totalprice").cast("decimal(18,6)"), 2)
            .cast("double")
            .alias("totalprice"),
        )
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty")
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
    WHERE ((n1.n_name = 'CHINA' AND n2.n_name = 'GERMANY')
        OR (n1.n_name = 'GERMANY' AND n2.n_name = 'CHINA'))
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
            ((F.col("supp_nation") == "CHINA") & (F.col("cust_nation") == "GERMANY"))
            | ((F.col("supp_nation") == "GERMANY") & (F.col("cust_nation") == "CHINA"))
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
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'CHINA' THEN volume
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
    china = F.when(F.col("supp_nation") == "CHINA", F.col("volume")).otherwise(
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
    avg_qty = l.groupBy(F.col("l_partkey").alias("a_key")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("threshold")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("a_key"))
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
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    ), rich_idle AS (
      SELECT c.c_custkey, c.c_nationkey % 5 AS cntrycode, c.c_acctbal
      FROM customer c CROSS JOIN avg_bal
      WHERE c.c_acctbal > avg_bal.a
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
    (scalar subquery + anti join)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("a"))
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("a")
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
