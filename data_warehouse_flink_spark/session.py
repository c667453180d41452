"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[N]`` (one JVM), but every config here is chosen
to also make sense on a large multi-executor cluster: AQE for runtime
re-planning (skew joins, partition coalescing), UTC session timezone for
deterministic event-time windows, Arrow for the Python boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "data_warehouse_flink_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    At cluster scale the same settings apply; only ``master`` and memory
    sizing change (supplied by spark-submit, not hard-coded here).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_GRAFT_MEM", "64g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # local mode = single JVM: driver memory is the only memory knob.
        .config("spark.driver.memory", mem)
        # A long analytics session compiles thousands of whole-stage-codegen
        # classes; the JVM's default 240 MB reserved code cache fills after
        # ~80-90 distinct queries, the JIT silently stops compiling, and
        # late-session queries degrade 4-10x (measured: the same query 1.6 s
        # early in a bench session, 17.8 s at position ~100). A 1 GB code
        # cache removes the cliff on any long-lived driver/executor.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
        # Shuffle parallelism ~ cores locally; AQE coalesces small partitions
        # at runtime so an over-estimate is cheap on a real cluster.
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime row-level filtering: inject Bloom filters from selective
        # join sides into the other side's scan (shuffle-volume reducer at
        # scale; no-op when the planner deems it unprofitable).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Deterministic event-time semantics; DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for all pandas_udf / applyInPandas boundaries.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # Back-compat: early testdata rounds stored events.ts as
        # TIMESTAMP(NANOS), which Spark can only read as an epoch-nano
        # LongType under this conf. Current testdata is timestamp[us] NTZ —
        # io.normalize_time_columns() handles both encodings; the conf just
        # keeps a legacy nanos file from erroring at scan time.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
