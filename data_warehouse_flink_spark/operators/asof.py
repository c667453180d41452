"""As-of join: for each left row, the most recent right row at-or-before it.

Spark has no native ASOF JOIN (DuckDB/kdb/pandas do). The range-join
formulation explodes on low-selectivity keys; the scalable form used here is
the union-scan trick: tag and union both streams, sort per key by (ts,
tag-priority), and carry the latest right-side values forward with
last_value(..., ignorenulls) — one shuffle on the key, one per-partition
sort, zero row explosion, identical asymptotics to the sort-merge pass an
ASOF join compiles to natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Backward as-of join (right.ts <= left.ts, greatest such ts).

    Output: all left columns + `asof_<col>` for each requested right column
    (NULL when no prior right row exists or it is older than `tolerance_sec`).
    Right rows are deduplicated to one per (key, ts) (max of each payload
    col) so ties are deterministic.

    Matched-ROW semantics (DuckDB ASOF JOIN's, which the gate oracle
    runs): asof_ts and every asof_<col> come from the SAME — the latest
    at-or-before — right row, so a NULL payload on the matched row stays
    NULL. The carried window value is therefore ONE struct of the whole
    right row (non-NULL for every right row, even an all-NULL payload);
    per-column last(ignorenulls) would resurrect an OLDER row's non-NULL
    payload under a NULL-payload match and could even mix columns across
    different right rows (caught by the as-of property twin,
    tests/test_properties.py).
    """
    # the union plan injects these working columns; a left frame already
    # using one of the names would be silently corrupted, so fail loudly
    reserved = {"_tag", "_rts", "_m", "asof_ts"} | {
        f"asof_{c}" for c in right_cols
    } | {f"_r_{c}" for c in right_cols}
    clashes = reserved.intersection(left.columns)
    if clashes:
        raise ValueError(
            f"asof_join: left columns collide with reserved names: "
            f"{sorted(clashes)}; rename them before joining"
        )
    if "_asof_match_ts" in right_cols:
        raise ValueError(
            "asof_join: '_asof_match_ts' is the match struct's ts field; "
            "rename the right column before joining"
        )
    r_dedup = right.groupBy(
        F.col(key), F.col(right_ts).alias("_rts")
    ).agg(*[F.max(c).alias(c) for c in right_cols])

    l_tag = left.withColumn("_tag", F.lit(1)).withColumn("_rts", F.col(left_ts))
    r_tag = (
        r_dedup.withColumn("_tag", F.lit(0))
        .select(
            key,
            "_rts",
            "_tag",
            *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        )
    )
    l_cols = left.columns
    unioned = l_tag.select(
        *l_cols,
        "_tag",
        "_rts",
        *[F.lit(None).cast(r_tag.schema[f"_r_{c}"].dataType).alias(f"_r_{c}")
          for c in right_cols],
    ).unionByName(
        r_tag.select(
            *[
                F.lit(None).cast(l_tag.schema[c].dataType).alias(c)
                if c != key
                else F.col(key)
                for c in l_cols
            ],
            "_tag",
            "_rts",
            *[F.col(f"_r_{c}") for c in right_cols],
        )
    )
    # right rows (tag 0) sort before left rows at equal ts → inclusive match
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc("_rts"), F.asc("_tag"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    match = F.last(
        F.when(
            F.col("_tag") == 0,
            F.struct(
                F.col("_rts").alias("_asof_match_ts"),
                *[F.col(f"_r_{c}").alias(c) for c in right_cols],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    carried = unioned.select(*l_cols, "_tag", "_rts", match.alias("_m"))
    out = carried.filter(F.col("_tag") == 1)
    match_ts = F.col("_m").getField("_asof_match_ts")
    if tolerance_sec is not None:
        horizon = F.unix_micros(F.col("_rts")) - tolerance_sec * 1_000_000
        within = F.unix_micros(match_ts) >= horizon
        out = out.withColumn("_m", F.when(within, F.col("_m")))
    return out.select(
        *l_cols,
        match_ts.alias("asof_ts"),
        *[F.col("_m").getField(c).alias(f"asof_{c}") for c in right_cols],
    )
