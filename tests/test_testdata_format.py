"""Testdata-format canary (VERDICT r2 #5).

The driver regenerates /root/testdata between rounds and has already changed
the on-disk timestamp encoding once (TIMESTAMP(NANOS) → timestamp[us] NTZ),
which silently broke 13 gate queries. These tests pin the POST-NORMALIZATION
contract every operator relies on: if the encoding changes again, exactly
these clearly-named tests fail first, pointing straight at
``io.normalize_time_columns``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from data_warehouse_flink_spark.io import table
from data_warehouse_flink_spark.schemas import TESTDATA_TABLES

from conftest import SF_SMOKE

# Column → expected post-normalization Spark type, per table. Key columns
# long, time columns plain TIMESTAMP (never NTZ, never raw long).
EXPECTED = {
    "events": {
        "event_id": T.LongType(),
        "ts": T.TimestampType(),
        "user_id": T.LongType(),
        "event_type": T.StringType(),
        "value": T.DoubleType(),
    },
    "orders": {
        "o_orderkey": T.LongType(),
        "o_custkey": T.LongType(),
        "o_orderdate": T.TimestampType(),
        "o_totalprice": T.DoubleType(),
    },
    "lineitem": {
        "l_orderkey": T.LongType(),
        "l_partkey": T.LongType(),
        "l_suppkey": T.LongType(),
        "l_shipdate": T.TimestampType(),
        "l_quantity": T.DoubleType(),
        "l_extendedprice": T.DoubleType(),
        "l_discount": T.DoubleType(),
    },
    "customer": {"c_custkey": T.LongType(), "c_acctbal": T.DoubleType()},
    "supplier": {"s_suppkey": T.LongType(), "s_acctbal": T.DoubleType()},
    "part": {"p_partkey": T.LongType(), "p_retailprice": T.DoubleType()},
    "documents": {"doc_id": T.LongType(), "text": T.StringType()},
    "embeddings": {
        "vec_id": T.LongType(),
        "embedding": T.ArrayType(T.FloatType()),
    },
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_testdata_dtypes_after_normalization(spark, name):
    schema = table(spark, SF_SMOKE, name).schema
    for col, want in EXPECTED[name].items():
        got = schema[col].dataType
        assert got == want, (
            f"{name}.{col}: {got} != {want} — the driver's testdata encoding "
            "changed; update io.normalize_time_columns"
        )


def test_no_ntz_or_raw_long_ts_leaks_through(spark):
    """No table may expose TIMESTAMP_NTZ after normalization."""
    for name in TESTDATA_TABLES:
        for field in table(spark, SF_SMOKE, name).schema.fields:
            assert not isinstance(field.dataType, T.TimestampNTZType), (
                f"{name}.{field.name} is TIMESTAMP_NTZ post-normalization"
            )


def test_stream_schema_matches_batch(spark):
    """streaming.sources.stream_events must agree with io.table exactly."""
    from data_warehouse_flink_spark.streaming.sources import stream_events

    batch = table(spark, SF_SMOKE, "events").schema
    stream = stream_events(spark, SF_SMOKE).schema
    assert stream == batch


def test_table_pins_utc_even_under_foreign_session_tz(spark):
    """An external harness session might not run UTC; io.table must pin it
    so the NTZ→TIMESTAMP cast stays instant-preserving (epoch values match
    DuckDB's naive-UTC read regardless of prior session state)."""
    from pyspark.sql import functions as F

    import duckdb

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = (
            table(spark, SF_SMOKE, "events")
            .select(F.min(F.unix_micros("ts")).alias("m"))
            .collect()[0]["m"]
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    want = (
        duckdb.connect()
        .execute(
            f"SELECT min(epoch_us(ts)) FROM '{SF_SMOKE}/events.parquet'"
        )
        .fetchone()[0]
    )
    assert got == want
