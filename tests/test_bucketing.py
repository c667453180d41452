"""Bucketing: the layout decision that removes the fact-fact join shuffle
(SCALING.md 'Joins'). Writes orders/lineitem bucketed by the join key into a
temp warehouse and asserts the join plan has no Exchange on either side.
"""

from __future__ import annotations

import pytest
from conftest import SF_SMOKE
from pyspark.sql import functions as F

from data_warehouse_flink_spark.io import table


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    warehouse = str(tmp_path / "wh")
    orders = table(spark, SF_SMOKE, "orders")
    lineitem = table(spark, SF_SMOKE, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", f"{warehouse}/orders_b")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", f"{warehouse}/lineitem_b")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    try:
        j = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        # same join on the unbucketed parquet DOES shuffle
        plain = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
        assert j.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucket_pruned_read(spark, tmp_path):
    """Bucket PRUNING: an equality filter on the bucketing column reads
    only the matching bucket's files (the scan advertises
    'SelectedBucketsCount: 1 out of 8') — at 100 TB a point lookup on a
    bucketed fact touches 1/n_buckets of the data with no index
    structure at all. Values verified against the unbucketed scan.

    GOTCHA (measured): `spark.sql.sources.bucketing.autoBucketedScan`
    (default TRUE) falls back to a regular scan when the query avoids
    no shuffle — a filter-only lookup then loses bucket pruning too.
    Point-lookup workloads over bucketed tables must disable it."""
    warehouse = str(tmp_path / "wh")
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    orders = table(spark, SF_SMOKE, "orders")
    (
        orders.write.bucketBy(8, "o_custkey")
        .option("path", f"{warehouse}/orders_pb")
        .mode("overwrite")
        .saveAsTable("orders_pb")
    )
    try:
        key = orders.select("o_custkey").first()["o_custkey"]
        pruned = spark.table("orders_pb").filter(F.col("o_custkey") == key)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        expect = sorted(
            tuple(r)
            for r in orders.filter(F.col("o_custkey") == key).collect()
        )
        assert sorted(tuple(r) for r in pruned.collect()) == expect
        assert expect  # the probed key actually has rows
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_pb")
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
