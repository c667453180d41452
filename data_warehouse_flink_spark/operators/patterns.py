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


# ---------------------------------------------------------------------------
# Legacy 2-step spec form (round-4 API, kept stable): SeqPattern +
# match_pattern — the MATCH_RECOGNIZE-style dataclass spec the
# `pattern_error_next_error` / `pattern_click_followed_by_purchase` gates
# register. The fluent `Pattern` builder above is the n-step superset; the
# equivalence of the two compilations is pinned in
# tests/test_round5_ops.py::test_pattern_builder_strict_equals_kernel and
# the oracle-parity gates.
# ---------------------------------------------------------------------------
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


# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE-style sugar over the Pattern builder (round-8 depth item:
# the SQL:2016 row-pattern surface Flink SQL exposes — reference users who
# write MATCH_RECOGNIZE instead of the DataStream CEP API get the same
# spelling here, compiled to the identical lag-chain / join-argmin plans).
_WITHIN_UNITS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
}


def _parse_within(within: str) -> int:
    import re

    m = re.fullmatch(r"\s*(\d+)\s+([a-z]+)\s*", within.lower())
    if not m or m.group(2) not in _WITHIN_UNITS:
        raise ValueError(
            f"within must look like '15 minutes' (units: "
            f"{sorted(set(_WITHIN_UNITS))}); got {within!r}"
        )
    return int(m.group(1)) * _WITHIN_UNITS[m.group(2)]


def match_recognize(
    df: DataFrame,
    partition_by: str,
    order_by: str | list[str],
    pattern: str,
    define: dict[str, "Column | str"],
    within: str,
) -> DataFrame:
    """SQL:2016 row-pattern sugar, Flink-SQL MATCH_RECOGNIZE flavored::

        match_recognize(
            events, partition_by="user_id", order_by=["ts", "event_id"],
            pattern="A A A",                    # strict contiguity
            define={"A": "event_type = 'error'"},
            within="24 hours",
        )
        match_recognize(
            orders, partition_by="order_id", order_by="ts",
            pattern="CREATE -> PAY",            # relaxed (followedBy)
            define={"CREATE": "event_type = 'create'",
                    "PAY": "event_type = 'pay'"},
            within="15 minutes",
        )

    ``pattern``: space-separated variables = STRICT contiguity (Flink CEP
    ``next``, any length); a single ``->`` between two variables = RELAXED
    contiguity (``followedBy`` — first qualifying completion per start).
    Repeating a variable (``"A A A"``) reuses its DEFINE predicate per
    step. ``define`` values are SQL boolean strings (``F.expr``-compiled)
    or Columns. Event time = the first ``order_by`` column (the
    MATCH_RECOGNIZE ordering column); ``within`` bounds last-step time
    minus first-step time, closed interval, like the builder.

    Output: one row per completed match — ``partition_by`` plus
    ``<var>_us`` (epoch micros) per step, numbered ``<var>2_us`` etc. on
    repeats — exactly the Pattern builder's contract, because this IS the
    Pattern builder: the sugar only parses, the plan shapes (lag chain /
    join + min-aggregate) are pinned by the builder's own gates
    (`login_fail_triple_cep`, `order_timeout`).
    """
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    if not order_cols:
        raise ValueError("order_by must name at least one column")
    relaxed = "->" in pattern
    tokens = (
        [t.strip() for t in pattern.split("->")]
        if relaxed
        else pattern.split()
    )
    if relaxed and (len(tokens) != 2 or any(" " in t for t in tokens)):
        raise ValueError(
            "relaxed patterns support exactly 'A -> B'; chain calls for "
            "longer relaxed sequences"
        )
    if len(tokens) < 2:
        raise ValueError("pattern needs at least two steps")
    unknown = [t for t in tokens if t not in define]
    if unknown:
        raise ValueError(f"pattern variables without DEFINE: {unknown}")

    def _cond(v: str) -> Column:
        c = define[v]
        return F.expr(c) if isinstance(c, str) else c

    seen: dict[str, int] = {}

    def _step_name(v: str) -> str:
        seen[v] = seen.get(v, 0) + 1
        return v if seen[v] == 1 else f"{v}{seen[v]}"

    pat = Pattern.begin(_step_name(tokens[0]), _cond(tokens[0]))
    for v in tokens[1:]:
        pat = (
            pat.followed_by(_step_name(v), _cond(v))
            if relaxed
            else pat.next(_step_name(v), _cond(v))
        )
    pat = pat.within(_parse_within(within))
    return pat.detect(
        df, partition_by, order_cols[0], order_cols=order_cols
    )
