"""Stream-stream joins with watermarks (SURVEY.md §2.5 J2/J3 streaming forms).

Spark's stream-stream join keeps both sides in the state store and prunes
state using the watermark + the time-range condition — exactly the semantics
of Flink's window/interval joins the reference uses
(DW-Flink OrderTimeoutDetect app/TxMatchWithJoin.scala:42-62).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_window_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    size: str,
    watermark: str = "0 seconds",
) -> DataFrame:
    """J2 streaming: equi-join inside the same tumbling window bucket.

    Both sides get the window column before the join, so the join key is
    (key, window) — state for a bucket is dropped once the watermark passes
    its end; no unbounded state.
    """
    lw = left.withWatermark(left_ts, watermark).withColumn(
        "window", F.window(left_ts, size)
    )
    rw = right.withWatermark(right_ts, watermark).withColumn(
        "window", F.window(right_ts, size)
    )
    return lw.join(rw, on=[key, "window"], how="inner")


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_sec: int,
    upper_sec: int,
    watermark: str = "0 seconds",
) -> DataFrame:
    """J3 streaming: key-equal + right.ts ∈ [left.ts+lower, left.ts+upper].

    The canonical Spark interval join: watermarks on both sides plus the
    range predicate let the engine expire state (a row is droppable once the
    other side's watermark passes its ts + the bound).
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower_sec} SECOND")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper_sec} SECOND")
        )
    )
    return l.join(r, on=cond, how="inner")
