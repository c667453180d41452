"""Streaming → warehouse mart maintenance.

The missing piece between the reference's print-sink demos and a real
warehouse: a continuously maintained, partitioned, queryable mart. The
idiom: update-mode streaming aggregate → foreachBatch → *dynamic partition
overwrite* of only the partitions the micro-batch touched.

Correctness constraint (learned the hard way, see
tests/test_streaming.py::test_mart_upsert_incremental_two_batches): the
partition columns MUST be the aggregate's full grouping key. Update mode
emits only changed rows; overwriting a partition that is coarser than the
grouping key (e.g. day-partitioning hourly windows) would drop that
partition's unchanged groups. With partition == group key, each overwrite
replaces exactly the changed group's row(s), which makes the sink
idempotent under micro-batch replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert_partitions_foreachbatch(
    agg: DataFrame,
    path: str,
    partition_cols: list[str],
):
    """Maintain a partitioned parquet mart from an update-mode streaming agg.

    `partition_cols` must equal the aggregate's grouping columns (see module
    docstring). Each micro-batch dynamically overwrites only the partitions
    (= groups) whose values changed.
    """

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.repartition(*partition_cols)
                .write.mode("overwrite")
                .partitionBy(*partition_cols)
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(per_batch)
        .trigger(availableNow=True)
        .start()
    )
