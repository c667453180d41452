"""Flink-CEP-style pattern builder (SURVEY.md §2.6 API parity).

The reference expresses detections as CEP patterns::

    Pattern.begin[LoginEvent]("firstFail").where(_.eventType == "fail")
      .next("secondFail").where(_.eventType == "fail")
      .within(Time.seconds(2))                 # LoginFailWithCEP.scala:38-43

    Pattern.begin[OrderEvent]("create").where(_.eventType == "create")
      .followedBy("pay").where(_.eventType == "pay")
      .within(Time.minutes(15))                # OrderTimeout.scala:32-36

This module gives users of the reference the same declarative surface,
compiled to the engine's relational plans:

- ``next`` (STRICT contiguity, any number of steps): per-row step flags +
  a lag chain over (key ORDER BY order_cols) — one shuffle, one per-key
  sort, zero state, arbitrary pattern length. Row r completes the pattern
  iff step_i matched at lag(n-1-i) for every i and the whole span fits in
  ``within``.
- ``followed_by`` (RELAXED contiguity, two steps): first qualifying
  completion per start within the bound (the reference's
  followedBy+within), with the timeout side output available from
  ``detect_timeouts`` — compiled to the same join/min-aggregate shape as
  ``detection.match_within_timeout``.

Batch forms only (the oracle-checkable backfill path); the streaming twins
with real timers remain the kernels in ``streaming/state.py`` — this
builder is the API that maps reference pattern code onto them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class _Step:
    name: str
    where: Column
    contiguity: str  # "begin" | "next" | "followed_by"


@dataclass(frozen=True)
class Pattern:
    steps: tuple[_Step, ...] = field(default_factory=tuple)
    within_sec: int | None = None

    # ---------------------------------------------------------- builder --
    @staticmethod
    def begin(name: str, where: Column) -> "Pattern":
        return Pattern(steps=(_Step(name, where, "begin"),))

    def next(self, name: str, where: Column) -> "Pattern":
        """Strict contiguity: this step must be the IMMEDIATELY following
        event of the same key (anything in between kills the match)."""
        self._check_name(name)
        return Pattern(
            steps=self.steps + (_Step(name, where, "next"),),
            within_sec=self.within_sec,
        )

    def followed_by(self, name: str, where: Column) -> "Pattern":
        """Relaxed contiguity: the first qualifying event of the same key
        at-or-after the previous step (other events may intervene)."""
        self._check_name(name)
        return Pattern(
            steps=self.steps + (_Step(name, where, "followed_by"),),
            within_sec=self.within_sec,
        )

    def within(self, seconds: int) -> "Pattern":
        return Pattern(steps=self.steps, within_sec=seconds)

    def _check_name(self, name: str) -> None:
        if any(s.name == name for s in self.steps):
            raise ValueError(f"duplicate step name {name!r}")

    # ---------------------------------------------------------- compile --
    def _validate(self) -> str:
        if len(self.steps) < 2:
            raise ValueError("a pattern needs at least two steps")
        if self.within_sec is None:
            raise ValueError("pattern needs .within(seconds)")
        kinds = {s.contiguity for s in self.steps[1:]}
        if kinds == {"next"}:
            return "strict"
        if kinds == {"followed_by"}:
            if len(self.steps) != 2:
                raise ValueError(
                    "followed_by patterns support exactly two steps; "
                    "chain multiple Pattern.detect calls for longer "
                    "relaxed sequences"
                )
            return "relaxed"
        raise ValueError("mixing next and followed_by is not supported")

    def detect(
        self,
        df: DataFrame,
        key: str,
        ts_col: str,
        order_cols: list[str] | None = None,
    ) -> DataFrame:
        """Full matches: one row per completed pattern — key plus
        ``<step>_us`` (epoch micros) for every step."""
        mode = self._validate()
        order_cols = order_cols or [ts_col]
        if mode == "strict":
            return self._detect_strict(df, key, ts_col, order_cols)
        return self._detect_relaxed(df, key, ts_col)["matches"]

    def detect_timeouts(
        self, df: DataFrame, key: str, ts_col: str
    ) -> DataFrame:
        """Timeout side output (followed_by patterns only): starts whose
        completion never arrived inside the bound — the reference's
        OrderTimeout side-output stream."""
        mode = self._validate()
        if mode != "relaxed":
            raise ValueError("timeouts are defined for followed_by patterns")
        return self._detect_relaxed(df, key, ts_col)["timeouts"]

    # ------------------------------------------------- strict (lag chain) --
    def _detect_strict(
        self,
        df: DataFrame,
        key: str,
        ts_col: str,
        order_cols: list[str],
    ) -> DataFrame:
        n = len(self.steps)
        w = Window.partitionBy(key).orderBy(*[F.asc(c) for c in order_cols])
        flagged = df.withColumn("_us", F.unix_micros(F.col(ts_col)))
        for i, s in enumerate(self.steps):
            flagged = flagged.withColumn(f"_m{i}", s.where)
        # row r is the LAST step; step i must have matched n-1-i rows back
        cond = F.col(f"_m{n - 1}")
        for i in range(n - 1):
            cond = cond & F.coalesce(
                F.lag(F.col(f"_m{i}"), n - 1 - i).over(w), F.lit(False)
            )
        span_ok = (
            F.col("_us") - F.lag("_us", n - 1).over(w)
            <= self.within_sec * 1_000_000
        )
        out_cols = [F.col(key)] + [
            F.lag("_us", n - 1 - i).over(w).alias(f"{s.name}_us")
            for i, s in enumerate(self.steps)
        ]
        return (
            flagged.withColumn("_hit", cond & span_ok)
            .select(*out_cols, "_hit")
            .filter(F.col("_hit"))
            .drop("_hit")
        )

    # -------------------------------------------- relaxed (join + argmin) --
    def _detect_relaxed(
        self, df: DataFrame, key: str, ts_col: str
    ) -> dict[str, DataFrame]:
        first, second = self.steps
        us = F.unix_micros(F.col(ts_col))
        a = df.filter(first.where).select(
            F.col(key).alias("_k"), us.alias(f"{first.name}_us")
        )
        b = df.filter(second.where).select(
            F.col(key).alias("_k"), us.alias(f"{second.name}_us")
        )
        bound = self.within_sec * 1_000_000
        joined = a.join(
            b,
            on=[
                a["_k"] == b["_k"],
                b[f"{second.name}_us"] >= a[f"{first.name}_us"],
                b[f"{second.name}_us"] <= a[f"{first.name}_us"] + bound,
            ],
            how="left",
        ).select(
            a["_k"].alias(key),
            f"{first.name}_us",
            f"{second.name}_us",
        )
        earliest = joined.groupBy(key, f"{first.name}_us").agg(
            F.min(f"{second.name}_us").alias(f"{second.name}_us")
        )
        return {
            "matches": earliest.filter(
                F.col(f"{second.name}_us").isNotNull()
            ),
            "timeouts": earliest.filter(
                F.col(f"{second.name}_us").isNull()
            ).drop(f"{second.name}_us"),
        }
