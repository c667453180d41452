"""Per-group top-N (SURVEY.md §2.4, T1-T3).

The reference re-keys windowed counts by windowEnd, buffers them in
ListState/MapState, and sorts on an event-time timer (DW-Flink
HotItemsAnalysis app/HotItems.scala:82-134, NetworkFlowAnalysis
app/NetworkFlow.scala:81-140). The Spark-native form is a rank over a window
partitioned by the group key — one extra shuffle on the partition key,
mirroring the reference's second keyBy.

Determinism: the ORDER BY always ends with unique tie-breaker columns so the
same rows win in any engine / partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    n: int,
    tiebreak_cols: list[str],
    rank_alias: str = "rn",
    descending: bool = True,
) -> DataFrame:
    """row_number() <= n per partition, with total-order tie-breaking.

    At scale this is a single hash shuffle on `partition_cols`; no global
    sort. Skewed partitions are bounded by per-partition top-N semantics
    (each task only tracks its partitions' rows).
    """
    order = [F.desc(order_col) if descending else F.asc(order_col)]
    order += [F.asc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= n)
    )
