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

    Precondition (unchanged since r1, now load-bearing for the join form):
    `updates` carries at most one row per key — the operator's contract is
    "one update batch", and both this and the pre-r15 anti-join form
    produce a corrupt history (several is_current rows per key) when a
    batch repeats a key.

    r15 (guide §2.4, VERDICT r14 #1): one FULL OUTER join on the key
    replaces the former 3 joins + distinct (anti on key+hash to find
    changes, distinct to key set, anti + semi to split the current slice).
    Each joined row maps to its output rows directly — cur-only keeps the
    current row, upd-only appends a fresh version, hash-equal keeps, and
    hash-change explodes into (closing, fresh). Per applied batch this is
    one shuffle of each side instead of three broadcast builds over the
    same current slice; equivalence is pinned by the Python-reference
    property test (tests/test_properties.py) and a randomized 4-batch
    chain A/B against the old form during the rewrite.
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

    joined = cur_h.alias("c").join(
        upd_h.alias("u"),
        on=F.col(f"c.{key}") == F.col(f"u.{key}"),
        how="full_outer",
    )

    def version(side: str, valid_from, valid_to, is_current):
        return F.struct(
            F.col(f"{side}.{key}").alias(key),
            *[F.col(f"{side}.{a}").alias(a) for a in attrs],
            valid_from.cast("long").alias("valid_from_us"),
            valid_to.cast("long").alias("valid_to_us"),
            is_current.alias("is_current"),
        )

    keep_cur = version(
        "c",
        F.col("c.valid_from_us"),
        F.col("c.valid_to_us"),
        F.col("c.is_current"),
    )
    closing = version(
        "c", F.col("c.valid_from_us"), F.lit(ts_us), F.lit(False)
    )
    fresh = version("u", F.lit(ts_us), F.lit(None), F.lit(True))

    out_rows = (
        F.when(F.col(f"u.{key}").isNull(), F.array(keep_cur))
        .when(F.col(f"c.{key}").isNull(), F.array(fresh))
        .when(F.col("c._h") == F.col("u._h"), F.array(keep_cur))
        .otherwise(F.array(closing, fresh))
    )
    cols = [key, *attrs, "valid_from_us", "valid_to_us", "is_current"]
    exploded = joined.select(F.explode(out_rows).alias("r")).select("r.*")
    return closed.select(cols).unionByName(exploded.select(cols))
