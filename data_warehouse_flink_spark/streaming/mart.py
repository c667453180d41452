"""Streaming → warehouse mart maintenance.

The missing piece between the reference's print-sink demos and a real
warehouse: a continuously maintained, partitioned, queryable mart. The
idiom: update-mode streaming aggregate → foreachBatch → *dynamic partition
overwrite* of only the partitions the micro-batch touched. Overwriting a
partition with its full recomputed content makes the sink idempotent under
micro-batch replay (exactly-once effect on top of at-least-once delivery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert_partitions_foreachbatch(
    agg: DataFrame,
    path: str,
    partition_col: str,
):
    """Maintain a partitioned parquet mart from an update-mode streaming agg.

    Each micro-batch carries the aggregate rows whose values changed; since
    a change in any row of a partition re-emits that row, overwriting the
    touched partitions with the batch's rows for them is a correct upsert
    for aggregates partitioned by a grouping column.
    """

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.repartition(1, partition_col)
                .write.mode("overwrite")
                .partitionBy(partition_col)
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
