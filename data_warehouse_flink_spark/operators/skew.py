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

    `salt_source` is required and must be a deterministic per-row expression
    on the big side (e.g. a unique id column) so retries/replays salt
    identically. Inner/left joins only: replicating the small side would
    duplicate its unmatched rows under right/full outer. Result equals the
    unsalted join row-for-row.
    """
    if how not in ("inner", "left_semi", "left", "left_outer"):
        # replicating the small side duplicates its unmatched rows under
        # right/full outer joins — refuse rather than return wrong results
        raise ValueError(f"salted_join does not support how={how!r}")
    if salt_source is None:
        raise ValueError(
            "salt_source must be a deterministic per-row column; an implicit "
            "nondeterministic default would break replay/retry semantics"
        )
    if isinstance(salt_source, str):
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
    Inner/semi only — pre-filtering the big side would delete the NULL-padded
    rows an outer join must keep.

    When the small side carries a selective predicate, most big-side rows
    would be dropped by the join anyway — dropping them at the scan stage
    keeps them out of the shuffle entirely. The broadcast left-semi is the
    exact form of Spark's runtime row-level (Bloom) filtering, which the
    session also enables for automatic injection on real clusters
    (spark.sql.optimizer.runtime.bloomFilter.enabled; the Bloom variant
    trades exactness of the pre-filter for a fixed-size broadcast — both
    produce identical join results).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"runtime_pruned_join does not support how={how!r}")
    keys = small.select(F.col(small_key).alias(big_key)).distinct()
    pruned = big.join(F.broadcast(keys), on=big_key, how="left_semi")
    return pruned.join(small, pruned[big_key] == small[small_key], how)
