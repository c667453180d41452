"""Table loading for the driver testdata directories."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_warehouse_flink_spark.schemas import TESTDATA_TABLES


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Parquet scan → pushdown + pruning for free.

    `events.ts` is stored as TIMESTAMP(NANOS), which Spark reads as an
    epoch-nano LongType (spark.sql.legacy.parquet.nanosAsLong); normalize it
    to a microsecond TimestampType here (truncation, matching DuckDB's
    ns→µs read) so every downstream operator sees a real event-time column.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    if name == "events":
        # Defensive: the conf is runtime-settable and the caller's session
        # (e.g. the driver's own) may not have it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
