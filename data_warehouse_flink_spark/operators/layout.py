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
