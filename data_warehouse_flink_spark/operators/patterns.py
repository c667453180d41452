"""MATCH_RECOGNIZE-style sequence-pattern sugar (SURVEY.md §4.2 item 3).

The reference expresses sequence detection twice: declaratively with Flink
CEP (`Pattern.begin("fail").next("fail").within(t)`,
DW-Flink LoginFailDetect app/LoginFailWithCEP.scala:38-44;
`begin("create").followedBy("pay").within(15 min)`,
OrderTimeoutDetect app/OrderTimeout.scala:32-36) and imperatively with
KeyedProcessFunctions. This module gives the engine one declarative spec
that compiles to the right Spark form:

- ``contiguity="next"``  → strictly consecutive rows per key: a lag()
  window-function plan (batch) — C1/C3.
- ``contiguity="followed_by"`` → first qualifying successor within the
  bound: a time-range join + min-aggregation plan (batch), with the
  timed-out remainder emitted like CEP's timeout side output — C4/C5.

Pure Python plan assembly over DataFrame ops — no Catalyst extension, no
UDFs; both forms are oracle-checkable SQL shapes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SeqPattern:
    """`first` then `second` within `within_sec`, per `key`.

    first/second are predicate Columns evaluated on the input rows.
    """

    key: str
    first: Column
    second: Column
    within_sec: int
    contiguity: str = "next"  # "next" | "followed_by"
    ts_col: str = "ts"
    order_cols: tuple[str, ...] = ("ts",)


def match_pattern(df: DataFrame, pattern: SeqPattern) -> DataFrame:
    """Compile and apply a sequence pattern.

    Output: key, first_us, second_us, result_type ∈ {matched, timeout}.
    (`next` emits only matches — strict contiguity has no timeout notion in
    the reference's CEP usage; `followed_by` emits the timeout class for
    firsts with no qualifying successor, mirroring PatternTimeoutFunction.)
    """
    if pattern.contiguity == "next":
        return _match_next(df, pattern)
    if pattern.contiguity == "followed_by":
        return _match_followed_by(df, pattern)
    raise ValueError(f"unknown contiguity {pattern.contiguity!r}")


def _match_next(df: DataFrame, p: SeqPattern) -> DataFrame:
    w = Window.partitionBy(p.key).orderBy(*[F.asc(c) for c in p.order_cols])
    flagged = df.withColumn("_first_ok", p.first).withColumn(
        "_second_ok", p.second
    )
    seq = flagged.withColumn("_prev_ok", F.lag("_first_ok").over(w)).withColumn(
        "_prev_ts", F.lag(p.ts_col).over(w)
    )
    us = F.unix_micros(F.col(p.ts_col))
    prev_us = F.unix_micros(F.col("_prev_ts"))
    return seq.filter(
        F.col("_second_ok")
        & F.col("_prev_ok")
        & (us - prev_us <= p.within_sec * 1_000_000)
    ).select(
        F.col(p.key),
        prev_us.alias("first_us"),
        us.alias("second_us"),
        F.lit("matched").alias("result_type"),
    )


def _match_followed_by(df: DataFrame, p: SeqPattern) -> DataFrame:
    firsts = df.filter(p.first).select(
        F.col(p.key).alias("k"), F.unix_micros(p.ts_col).alias("first_us")
    )
    seconds = df.filter(p.second).select(
        F.col(p.key).alias("k"), F.unix_micros(p.ts_col).alias("second_us")
    )
    joined = firsts.join(
        seconds,
        on=[
            firsts["k"] == seconds["k"],
            seconds["second_us"] > firsts["first_us"],
            seconds["second_us"]
            <= firsts["first_us"] + p.within_sec * 1_000_000,
        ],
        how="left",
    ).select(firsts["k"].alias(p.key), "first_us", "second_us")
    earliest = joined.groupBy(p.key, "first_us").agg(
        F.min("second_us").alias("second_us")
    )
    return earliest.withColumn(
        "result_type",
        F.when(F.col("second_us").isNotNull(), F.lit("matched")).otherwise(
            F.lit("timeout")
        ),
    )
