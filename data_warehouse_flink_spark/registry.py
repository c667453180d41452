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
# which queries get oracle evidence each round. Priority for round 13
# (VERDICT r12 directive #1 — exactly the rotation pre-announced here in
# round 12):
# (1) the 22 SURVEY §2 gate queries — stay in every round's prefix;
# (2) first-evidence entries FIRST (the documented rule since r8):
#     none this round — the registry stays frozen at 176 (VERDICT r12 #6)
#     and round 13 adds no registered queries.
# (3) periodic-reconfirmation cadence (rule since r7: after first-evidence
#     entries, fill the prefix with the queries holding the OLDEST driver
#     hash evidence, ties broken by registration order, so no query's
#     evidence age is unbounded; oracle-less entries are SKIPPED per the
#     r12 amendment — ``all_queries()`` enforces this structurally by
#     sorting oracle-less entries last and refusing an oracle-less name in
#     _GRADING_PRIORITY outright). This round: the full r7-evidence
#     remainder of 12, then the first 16 of the r8 cohort of 28 in
#     registration order — exactly the plan VERDICT r12 #1 names.
# 22 + 0 + 12 + 16 = 50 exactly, all oracle-bearing. After this round's
# grading no oracle-bearing query's evidence is older than r8. Next up
# (round 14): the r8 remainder of 12 (events_rollup, events_cube,
# event_value_percentiles, viewers_never_purchased, user_running_value,
# windowed_value_sum, pattern_error_next_error,
# pattern_click_followed_by_purchase, user_value_outliers,
# conversion_funnel, hourly_counts_gapfilled, weekly_cohort_retention),
# then the first 16 of the r9 cohort of 28 in registration order
# (streaming_user_sessions, doc_minhash_lsh, doc_simhash, knn_lsh,
# streaming_knn, multimodal_features, multimodal_frames,
# doc_rolling_fingerprint, knn_ivf, streaming_near_dedup,
# doc_dedup_keep_best, doc_semantic_dedup_scores, knn_pq,
# doc_importance_weights, doc_bpe_encode, embedding_sq8).
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
    # -- oldest-evidence reconfirmation: the r7 remainder of 12, then the
    # first 16 of the r8 cohort (evidence CORRECTNESS_r07/r08;
    # registration order; oracle-less entries skipped per the r12 cadence
    # amendment — none occur in these cohorts anyway) --
    "embedding_dedup_cosine",  # r7
    "knn_bruteforce",  # r7
    "doc_token_stats",  # r7
    "doc_fingerprint",  # r7
    "doc_language_id",  # r7
    "corpus_curation",  # r7
    "doc_bpe_tokens",  # r7
    "doc_chunks",  # r7
    "doc_unigram_logprob",  # r7
    "doc_prefix_edit_distance",  # r7
    "doc_simhash_recall_report",  # r7
    "event_value_percentiles_approx",  # r7
    "doc_dup_clusters",  # r8
    "doc_tfidf",  # r8
    "doc_stratified_sample",  # r8
    "streaming_distinct_pairs",  # r8
    "doc_pack_sequences",  # r8
    "embedding_label_centroids",  # r8
    "doc_repetition_score",  # r8
    "doc_pii_redact",  # r8
    "doc_contamination",  # r8
    "corpus_mixture_weights",  # r8
    "doc_span_dedup_fast_contract",  # r8
    "doc_exact_substring_dedup_fast_contract",  # r8
    "doc_importance_weights_fast_contract",  # r8
    "doc_minhash_lsh_fast_contract",  # r8
    "corpus_shuffle_shards",  # r8
    "knn_recall_report",  # r8
)
# Rotated OUT of the prefix this round: the r6 remainder of 12 and the r7
# cohort head of 16 (all regraded r12). Evidence ages after this round's
# grading: r8 remainder (12), then r9 (28) / r10 (28) / r11 (26) / r12
# (28 non-gate entries regraded r12; the 22 gates regrade every round).
# The local parity suite still re-verifies every registered oracle each
# session; the driver prefix is the independent re-proof channel.


def all_queries() -> dict[str, Query]:
    load_all()
    rank = {name: i for i, name in enumerate(_GRADING_PRIORITY)}
    bad = [n for n in _GRADING_PRIORITY if _REGISTRY[n].oracle is None]
    if bad:  # r12 cadence amendment: a prefix slot must never read no_oracle
        raise ValueError(f"oracle-less queries in _GRADING_PRIORITY: {bad}")
    default = len(_GRADING_PRIORITY)
    # Sort: graded prefix first (priority order), then oracle-bearing
    # entries in registration order, then oracle-less entries LAST — so the
    # driver's fixed-size graded prefix can structurally never land on a
    # rows-only entry, whatever the prefix size or registration order.
    ordered = sorted(
        enumerate(_REGISTRY.items()),
        key=lambda pair: (
            rank.get(pair[1][0], default),
            pair[1][1].oracle is None,
            pair[0],
        ),
    )
    return {name: q for _, (name, q) in ordered}


def spark_queries() -> dict[str, SparkQuery]:
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracles() -> dict[str, str]:
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
