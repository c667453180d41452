"""SQL-surface analytics beyond the reference's inventory (SURVEY.md §2.8):
rollup/cube/pivot, exact percentiles, set operations, analytic running
aggregates, windowed value aggregation. The reference has none of these; the
engine exposes them via Spark built-ins with zero custom code — registered
here so the correctness gate proves each one against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_flink_spark.io import table
from data_warehouse_flink_spark.registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events")


@register(
    "events_rollup",
    oracle="""
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP (event_type, strftime(ts, '%Y-%m-%d'))
    """,
)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals: (type, day) → (type) → grand total."""
    ev = _events(spark, sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    return ev.rollup("event_type", "day").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "events_cube",
    oracle="""
    SELECT event_type, user_id % 10 AS cohort, count(*) AS cnt
    FROM events
    GROUP BY CUBE (event_type, user_id % 10)
    """,
)
def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping-set combinations over (type, user cohort)."""
    ev = _events(spark, sf_dir).withColumn("cohort", F.col("user_id") % 10)
    return ev.cube("event_type", "cohort").agg(F.count("*").alias("cnt"))


@register(
    "events_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'view') AS view,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'error') AS error
    FROM events GROUP BY user_id
    """,
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavior profile: event counts pivoted to columns."""
    out = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )
    return out


@register(
    "event_value_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99,
           ROUND(CAST(max(value) AS DOUBLE), 6) AS max_value
    FROM events GROUP BY event_type
    """,
)
def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of `value` per event type.

    `F.percentile` (exact) matches DuckDB's quantile_cont definition
    (linear interpolation at rank p·(n-1)); at 100 TB swap for
    `percentile_approx` — same call shape, bounded memory.
    """
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


@register(
    "viewers_never_purchased",
    oracle="""
    SELECT user_id FROM events
    WHERE event_type = 'view' AND ts < TIMESTAMP '2024-01-08 00:00:00'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08 00:00:00'
    """,
)
def viewers_never_purchased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: first-week viewers who never purchased that week."""
    ev = _events(spark, sf_dir).filter(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp")
    )
    viewers = ev.filter(F.col("event_type") == "view").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return viewers.subtract(buyers)


@register(
    "user_running_value",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
    FROM events
    """,
)
def user_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic running total of `value` per user over event time.

    Decimal accumulation keeps the prefix sums exact (and engine-portable);
    one shuffle on user_id + per-partition sort.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


@register(
    "windowed_value_sum",
    oracle="""
    SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start_sec,
           event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def windowed_value_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 beyond count: per-window sum/avg of a value column."""
    ev = _events(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_value"),
    )
    return agg.select(
        F.unix_timestamp("window.start").alias("window_start_sec"),
        "event_type",
        "sum_value",
        "avg_value",
    )
