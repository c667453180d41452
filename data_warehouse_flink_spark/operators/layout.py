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
       one row per partition, so they are collected to the driver (the
       only driver-side data is this partition-count list), cumsum'd, and
       broadcast back. Collecting also makes the encoding's hard limit
       LOUD: a partition beyond 2^33 rows would silently bleed sequence
       bits into the partition bits, so it raises here instead.

    Total cost: one range exchange + one tiny aggregate + one broadcast
    join; no stage ever concentrates the data.

    NOTE: each call freezes its own layout (an eager localCheckpoint).
    Callers invoking this repeatedly on the same input should cache the
    RESULT (see `corpus_shuffle_shards`'s session cache) — per-invocation
    checkpoints leak a cached block per call, the round-6 knn_ivf_pq
    lesson.
    """
    spark = df.sparkSession
    if num_partitions is not None:
        n = num_partitions
    else:
        try:
            n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        except ValueError:  # e.g. "auto" on AQE-managed deployments
            n = 256
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
    counts = sorted(
        (r["_pid"], r["_cnt"])
        for r in base.groupBy("_pid").agg(F.count("*").alias("_cnt"))
        .collect()
    )
    if any(cnt >= (1 << 33) for _, cnt in counts):
        raise ValueError(
            "global_row_number: a range partition holds >= 2^33 rows; "
            "monotonically_increasing_id's sequence bits would overflow "
            "into the partition bits — raise num_partitions"
        )
    offsets, running = [], 0
    for pid, cnt in counts:
        offsets.append((pid, running))
        running += cnt
    off_df = spark.createDataFrame(offsets, schema="_pid long, _off long")
    return (
        base.join(F.broadcast(off_df), "_pid")
        .withColumn(pos_col, (F.col("_off") + F.col("_seq") + 1).cast("long"))
        .drop("_mid", "_pid", "_seq", "_off")
    )
