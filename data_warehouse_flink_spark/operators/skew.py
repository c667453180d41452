"""Skew-mitigation utilities (SURVEY.md §7; BASELINE 'design for 100 TB').

AQE's skew-join handling covers sort-merge joins automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py). Manual salting is
still the tool when a *shuffled hash* join keys on a pathologically hot key
and the small side fits in memory × B replicas but not in a broadcast:
replicate the small side across B salt values and split the big side's hot
key into B sub-keys, so no single task owns the whole hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int,
    salt_source: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's keys split across `buckets` salts.

    `salt_source` must be a deterministic per-row expression on the big side
    (default: xxhash64 of the whole-row key + a unique column is the caller's
    job; passing None salts by xxhash64(key) only, which still splits hot
    keys when combined with a distinct column). Result equals the unsalted
    join row-for-row.
    """
    if salt_source is None:
        salt_source = F.monotonically_increasing_id()
    elif isinstance(salt_source, str):
        salt_source = F.col(salt_source)
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_source), F.lit(buckets)).cast("int")
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(buckets)])
    ).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def runtime_pruned_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    how: str = "inner",
) -> DataFrame:
    """Runtime-filter join: prune the big side BEFORE its shuffle with a
    broadcast semi-join on the (already filtered) small side's keys.

    When the small side carries a selective predicate, most big-side rows
    would be dropped by the join anyway — dropping them at the scan stage
    keeps them out of the shuffle entirely. The broadcast left-semi is the
    exact form of Spark's runtime row-level (Bloom) filtering, which the
    session also enables for automatic injection on real clusters
    (spark.sql.optimizer.runtime.bloomFilter.enabled; the Bloom variant
    trades exactness of the pre-filter for a fixed-size broadcast — both
    produce identical join results).
    """
    keys = small.select(F.col(small_key).alias(big_key)).distinct()
    pruned = big.join(F.broadcast(keys), on=big_key, how="left_semi")
    return pruned.join(small, pruned[big_key] == small[small_key], how)
