"""Query registry: every engine capability as a named, oracle-checked query.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL string DuckDB can run over the same parquet tables.
``__spark_entry__.py`` exposes the registry to the driver; the local test
harness (tests/test_oracle_parity.py) replicates the driver's compare so
regressions surface before a round ends.

Determinism conventions (so value-hashes match across engines):
- window bounds and timestamps are emitted as epoch BIGINTs, never raw
  timestamps (`unix_timestamp` / `unix_micros` on the Spark side,
  `epoch`/`epoch_us` casts on the DuckDB side);
- sums/avgs over doubles go through DECIMAL casts (exact, order-independent)
  and are ROUNDED IN THE DECIMAL DOMAIN (HALF_UP, identical across engines)
  before the final DOUBLE cast — rounding the converted double instead
  diverges at .5 boundaries, and the conversion itself double-rounds when
  the scaled mantissa exceeds 2^53;
- every top-N ordering carries a unique tie-breaker key;
- aggregate/computed columns are aliased identically in both dialects.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    doc: str


_REGISTRY: dict[str, Query] = {}

# Modules whose import registers queries.
_QUERY_MODULES = (
    "data_warehouse_flink_spark.plans.reference_jobs",
    "data_warehouse_flink_spark.plans.tpch",
    "data_warehouse_flink_spark.plans.llm_ops",
    "data_warehouse_flink_spark.plans.analytics",
    "data_warehouse_flink_spark.plans.sql_frontend",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a Spark query, optionally with its DuckDB oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


# The driver grades a fixed-size prefix of the registry (50 entries in every
# round so far, in ``queries()`` iteration order), so iteration order decides
# which queries get oracle evidence each round. Priority for round 9
# (VERDICT r8 directives #1 and #2):
# (1) the 22 SURVEY §2 gate queries — stay in every round's prefix;
# (2) first-evidence entries FIRST (the documented rule: first-evidence
#     goes ahead of reconfirmations): the seven round-8-continuation
#     queries that landed after the r8 prefix froze and therefore carry
#     only local 3-SF parity evidence — the k-means trainer family
#     (embedding_kmeans_train / embedding_kmeans_assign / knn_ivf_trained),
#     the incremental near-dedup path (doc_minhash_incremental), the PQ
#     trainer + trained-ADC serving (embedding_pq_train / knn_pq_trained),
#     and the BPE merge trainer (corpus_bpe_train) — plus the two round-9
#     sampled-fit serving gates (knn_ivf_trained_sampled and
#     knn_pq_trained_sampled, VERDICT r8 #4). Hash-green rows here take
#     cumulative driver evidence to every oracle-bearing query except the
#     two r4 tail entries that yielded their slots.
# (3) periodic-reconfirmation cadence (rule since r7: after first-evidence
#     entries, fill the prefix with the queries holding the OLDEST driver
#     hash evidence, ties broken by registration order, so no query's
#     evidence age is unbounded). This round: the two remaining r3-evidence
#     queries (error_rate_spikes, purchase_asof_click — they yielded their
#     r8 slots to first-evidence entries) then the first 17 of the r4
#     cohort of 28 in registration order (two more r4 entries yielded
#     to the round-9 sampled-fit first-evidence gates).
# 22 + 9 + 2 + 17 = 50 exactly. Next up (round 10): the r4 tail
# (doc_hash_embedding, events_pivot, events_grouping_sets,
# user_tier_scd2, events_compaction_plan, events_column_stats,
# event_value_histogram_quantiles, orders_integrity_checks,
# sql_priority_counts, sql_nation_customer_stats,
# sql_lineitem_by_quantity_band), then the r5 cohort (28).
_GRADING_PRIORITY = (
    # -- §2 gates (reference_jobs registration order) --
    "page_view",
    "hot_items_topn",
    "network_flow_topn",
    "unique_visitors",
    "uv_approx",
    "app_marketing_by_channel",
    "app_marketing_total",
    "ad_clicks_by_geo",
    "ad_blacklist_warnings",
    "login_fail_consecutive",
    "login_fail_threshold",
    "order_timeout",
    "tx_match",
    "tx_match_window_join",
    "tx_match_interval_join",
    "streaming_page_view",
    "user_sessions",
    "streaming_unique_visitors",
    "ad_clicks_by_geo_fine",
    "streaming_tx_match_window_join",
    "streaming_hot_items_topn",
    "streaming_update_emissions",
    # -- first-evidence: the seven round-8-continuation trainer /
    # incremental queries (registration order; never driver-graded) --
    "embedding_kmeans_train",
    "embedding_kmeans_assign",
    "knn_ivf_trained",
    "doc_minhash_incremental",
    "embedding_pq_train",
    "knn_pq_trained",
    "corpus_bpe_train",
    "knn_ivf_trained_sampled",
    "knn_pq_trained_sampled",
    # -- oldest-evidence reconfirmation: the r3 remainder then the first
    # 19 of the r4 cohort (evidence CORRECTNESS_r03/r04; registration
    # order) --
    "error_rate_spikes",  # r3
    "purchase_asof_click",  # r3
    "streaming_user_sessions",  # r4
    "doc_minhash_lsh",  # r4
    "doc_simhash",  # r4
    "knn_lsh",  # r4
    "streaming_knn",  # r4
    "multimodal_features",  # r4
    "multimodal_frames",  # r4
    "doc_rolling_fingerprint",  # r4
    "knn_ivf",  # r4
    "streaming_near_dedup",  # r4
    "doc_dedup_keep_best",  # r4
    "doc_semantic_dedup_scores",  # r4
    "knn_pq",  # r4
    "doc_importance_weights",  # r4
    "doc_bpe_encode",  # r4
    "embedding_sq8",  # r4
    "knn_rrf",  # r4
)
# Rotated OUT of the prefix this round: the r3 cohort of 22 (all
# hash-green in CORRECTNESS_r08) and the six r8 first-evidence entries
# (contracts / recall audit / shard planner, hash-green r8). Evidence
# ages after this round's grading: r4 tail (11), then r5 (28) / r6 / r7.
# The local parity suite still re-verifies every registered oracle each
# session; the driver prefix is the independent re-proof channel.


def all_queries() -> dict[str, Query]:
    load_all()
    rank = {name: i for i, name in enumerate(_GRADING_PRIORITY)}
    default = len(_GRADING_PRIORITY)
    ordered = sorted(
        enumerate(_REGISTRY.items()),
        key=lambda pair: (rank.get(pair[1][0], default), pair[0]),
    )
    return {name: q for _, (name, q) in ordered}


def spark_queries() -> dict[str, SparkQuery]:
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracles() -> dict[str, str]:
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
