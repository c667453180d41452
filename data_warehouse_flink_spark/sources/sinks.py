"""Warehouse sinks (SURVEY.md §2.1 S4/S5 and the warehouse side the
reference lacks).

The reference only prints to stdout (S5) or pumps CSV into Kafka (S4). A
real warehouse lands results as partitioned columnar files; these helpers
encode the layout decisions that matter at 100 TB:

- partition by low-cardinality time/day columns only (predicate pruning on
  read, no small-file explosion from high-cardinality keys);
- explicit file sizing via repartition before write (one task = one file);
- streaming variants ride foreachBatch/file sink with checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Land a result as day/key-partitioned parquet.

    `files_per_partition` controls output file count per partition value
    (repartition on the partition columns first so each task writes whole
    partitions — avoids the many-small-files failure mode).
    """
    out = df
    if partition_cols:
        out = df.repartition(files_per_partition, *partition_cols)
        out.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    else:
        out.coalesce(files_per_partition).write.mode(mode).parquet(path)


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_cols: list[str] | None = None,
    trigger_available_now: bool = True,
):
    """Streaming file sink with checkpointing (exactly-once per file batch)."""
    w = df.writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint
    )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def to_kafka_records(df: DataFrame, value_cols: list[str]) -> DataFrame:
    """S4: shape a DataFrame for the Kafka sink (CSV value payload, matching
    the reference's KafkaProducer.scala line format). Write with
    `.write.format('kafka')` on a cluster with the connector jar."""
    return df.select(
        F.concat_ws(",", *[F.col(c).cast("string") for c in value_cols]).alias(
            "value"
        )
    )
