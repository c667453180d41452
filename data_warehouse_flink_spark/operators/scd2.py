"""Slowly-changing-dimension type 2 maintenance without a table format.

MERGE INTO needs Delta/Iceberg (jars not in this image); the engine form is
the classic emulation — change detection by anti-join on attribute hashes,
closing current rows and unioning new versions — producing a full history
table: one row per (key, version) with [valid_from_us, valid_to_us) and an
is_current flag. Deterministic, idempotent for replayed batches (a re-applied
identical update detects no change).

Scale: one shuffle on the business key per applied batch; history grows by
changed keys only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(snapshot: DataFrame, key: str, attrs: list[str],
              ts_us: int) -> DataFrame:
    """Bootstrap a history table from an initial snapshot."""
    return snapshot.select(
        key,
        *attrs,
        F.lit(ts_us).cast("long").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts_us: int,
) -> DataFrame:
    """Apply one update batch (full rows: key + attrs) effective at ts_us.

    - changed keys: current row closed at ts_us, new current row appended
    - new keys: appended as current
    - unchanged keys / historical rows: untouched
    """
    cur = history.filter(F.col("is_current"))
    closed = history.filter(~F.col("is_current"))

    # to_json(struct) keeps attribute boundaries and NULLs distinct:
    # concat_ws would hash ('a','bc') equal to ('ab','c') and skip NULLs
    # entirely, so real changes could be silently dropped.
    attr_hash = F.md5(
        F.to_json(
            F.struct(*[F.col(a) for a in attrs]),
            {"ignoreNullFields": "false"},
        )
    )
    cur_h = cur.withColumn("_h", attr_hash)
    upd_h = updates.select(key, *attrs).withColumn("_h", attr_hash)

    changed_or_new = upd_h.alias("u").join(
        cur_h.select(key, "_h").alias("c"),
        on=[F.col(f"u.{key}") == F.col(f"c.{key}"),
            F.col("u._h") == F.col("c._h")],
        how="left_anti",
    )
    affected_keys = changed_or_new.select(F.col(key)).distinct()

    untouched_current = cur.join(affected_keys, on=key, how="left_anti")
    closing = (
        cur.join(affected_keys, on=key, how="left_semi")
        .withColumn("valid_to_us", F.lit(ts_us).cast("long"))
        .withColumn("is_current", F.lit(False))
    )
    fresh = changed_or_new.select(
        key,
        *attrs,
        F.lit(ts_us).cast("long").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"),
        F.lit(True).alias("is_current"),
    )
    cols = [key, *attrs, "valid_from_us", "valid_to_us", "is_current"]
    return (
        closed.select(cols)
        .unionByName(untouched_current.select(cols))
        .unionByName(closing.select(cols))
        .unionByName(fresh.select(cols))
    )
