"""Schemas: reference beans re-expressed as StructTypes + testdata tables.

Reference bean shapes (cited for parity, see SURVEY.md §1.1):
- UserBehavior          DW-Flink/HotItemsAnalysis/.../bean/UserBehavior.scala:15-19
- ApacheLogEvent        DW-Flink/NetworkFlowAnalysis/.../bean/ApacheLogEvent.scala:8-12
- AdClickLog            DW-Flink/MarketAnalysis/.../bean/AdClickLog.scala:14-18
- MarketingUserBehavior DW-Flink/MarketAnalysis/.../bean/MarketingUserBehavior.scala:14-17
- LoginEvent            DW-Flink/LoginFailDetect/.../bean/LoginEvent.scala:12-15
- OrderEvent(WithTxId)  DW-Flink/OrderTimeoutDetect/.../bean/OrderEventWithTxId.scala:8-11
- ReceiptEvent          DW-Flink/OrderTimeoutDetect/.../bean/ReceiptEvent.scala:10-12

Timestamps: the reference keeps epoch-second Longs and multiplies by 1000 at
watermark assignment. We keep the raw long column AND derive a proper
TimestampType column ``ts`` via ``F.timestamp_seconds`` in the readers.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference bean schemas (CSV column order matches the reference files) ---

USER_BEHAVIOR = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("item_id", T.LongType(), False),
        T.StructField("category_id", T.IntegerType(), False),
        T.StructField("behavior", T.StringType(), False),
        T.StructField("ts_sec", T.LongType(), False),
    ]
)

APACHE_LOG_EVENT = T.StructType(
    [
        T.StructField("ip", T.StringType(), False),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
    ]
)

AD_CLICK_LOG = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ad_id", T.LongType(), False),
        T.StructField("province", T.StringType(), False),
        T.StructField("city", T.StringType(), False),
        T.StructField("ts_sec", T.LongType(), False),
    ]
)

MARKETING_USER_BEHAVIOR = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("behavior", T.StringType(), False),
        T.StructField("channel", T.StringType(), False),
        T.StructField("ts_ms", T.LongType(), False),
    ]
)

LOGIN_EVENT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ip", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("ts_sec", T.LongType(), False),
    ]
)

ORDER_EVENT = T.StructType(
    [
        T.StructField("order_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("tx_id", T.StringType(), True),
        T.StructField("ts_sec", T.LongType(), False),
    ]
)

RECEIPT_EVENT = T.StructType(
    [
        T.StructField("tx_id", T.StringType(), False),
        T.StructField("pay_channel", T.StringType(), False),
        T.StructField("ts_sec", T.LongType(), False),
    ]
)

# --- driver testdata tables (/root/testdata/sf*/; see TESTDATA.md) ---

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
