"""Multi-dimensional data layout: z-order (Morton) clustering for skipping.

At 100 TB the cheapest query is the one that never reads the file: engines
skip files whose min/max column stats exclude the predicate. Sorting by one
column gives perfect skipping on that column and none on any other; a
z-order curve interleaves the bits of two (or more) dimensions so every file
covers a small RECTANGLE in the combined space — predicates on EITHER
dimension prune well. This module computes the z-value and file assignment
as pure integer expressions (JVM codegen, zero shuffle until the final
write/groupBy); `zorder_file_stats` materializes exactly the min/max
metadata a scan planner would prune with.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(x: Column, y: Column, bits: int = 5) -> Column:
    """Interleave the low ``bits`` of x (odd positions) and y (even):
    z = x4 y4 x3 y3 ... x0 y0. Plain shifts/masks — whole-stage codegen."""
    z = F.lit(0)
    for b in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b + 1)
            + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b)
        )
    return z.cast("long")


def zorder_file_stats(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 5,
    file_shift: int = 4,
) -> DataFrame:
    """Assign every row to a z-order file (``z >> file_shift``) and emit the
    per-file min/max skipping stats for both dimensions.

    With ``file_shift`` a multiple of 2, each file is a complete quadtree
    block: 2^(shift/2) wide in BOTH dimensions — the balanced-pruning
    guarantee (a 1-D sort would span the full range of the other column).
    One scan + one small groupBy (#files cells, map-side combined).
    """
    z = zorder_value(x, y, bits)
    rows = df.select(
        x.alias("xv"),
        y.alias("yv"),
        F.shiftright(z, file_shift).cast("long").alias("file_id"),
    )
    return rows.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("xv").cast("long").alias("min_x"),
        F.max("xv").cast("long").alias("max_x"),
        F.min("yv").cast("long").alias("min_y"),
        F.max("yv").cast("long").alias("max_y"),
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    pos_col: str = "pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global position in the total order over ``order_cols``
    (which must be a unique key) — WITHOUT the single-partition trap.

    ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY forces Spark
    to exchange the ENTIRE dataset into one partition — the canonical
    100 TB killer. This computes the identical numbering distributed:

    1. ``repartitionByRange`` on the order keys (the one exchange any
       global ordering pays; ranges land on ascending partition indexes,
       and AQE coalescing only merges ADJACENT ranges, preserving that),
       then sort within partitions and FREEZE the layout with an eager
       localCheckpoint (both downstream consumers must see one layout).
    2. Per-partition sequence numbers come free from
       ``monotonically_increasing_id`` evaluated over the sorted layout —
       its encoding is (partition index << 33) + in-partition row number,
       i.e. a distributed zipWithIndex with zero extra shuffle.
    3. Per-partition offsets are a running sum over the partition COUNTS —
       a table with one row per partition, where a single-partition window
       is exactly right. Broadcast back and add.

    Total cost: one range exchange + one tiny aggregate + one broadcast
    join; no stage ever concentrates the data.
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    parts = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    base = parts.withColumn(
        "_pid", F.shiftrightunsigned(F.col("_mid"), 33)
    ).withColumn(
        "_seq", F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
    )
    counts = base.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    from pyspark.sql import Window

    w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w), F.lit(0)).alias("_off")
    )
    return (
        base.join(F.broadcast(offsets), "_pid")
        .withColumn(pos_col, (F.col("_off") + F.col("_seq") + 1).cast("long"))
        .drop("_mid", "_pid", "_seq", "_off")
    )
