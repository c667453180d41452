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
# which queries get oracle evidence each round. Priority for round 10
# (VERDICT r9 directives #1 and #3):
# (1) the 22 SURVEY §2 gate queries — stay in every round's prefix;
# (2) first-evidence entries FIRST (the documented rule since r8:
#     first-evidence goes ahead of reconfirmations): this round only
#     `corpus_bpe_train_batched` (VERDICT r9 #3 — the batch_size=4 path
#     under its own hash gate; the sequential path graded r9).
# (3) periodic-reconfirmation cadence (rule since r7: after first-evidence
#     entries, fill the prefix with the queries holding the OLDEST driver
#     hash evidence, ties broken by registration order, so no query's
#     evidence age is unbounded). This round: the full r4-evidence tail of
#     11, then the first 16 of the r5 cohort of 28 in registration order
#     (VERDICT r9 #1 budgeted 17, but its own #3 requires the
#     first-evidence gate a slot and the documented rule puts
#     first-evidence ahead — the 17th, events_zorder_layout's successor
#     streaming_value_histogram_quantiles, leads the r11 tail instead).
# 22 + 1 + 11 + 16 = 50 exactly. Next up (round 11): the r5 remainder
# (streaming_value_histogram_quantiles, events_key_skew_profile,
# events_k_anonymity, user_cdc_snapshot, streaming_user_cdc_snapshot,
# events_props_json, events_backfill_plan, events_sessionize_gap_stats,
# events_rollup_incremental, streaming_sessionize_gap_stats,
# events_dq_anomaly, streaming_dq_anomaly — 12), then the r6 cohort.
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
    # -- first-evidence: the round-10 batched-BPE gate (never graded) --
    "corpus_bpe_train_batched",
    # -- oldest-evidence reconfirmation: the r4 tail of 11, then the
    # first 16 of the r5 cohort (evidence CORRECTNESS_r04/r05;
    # registration order) --
    "doc_hash_embedding",  # r4
    "events_pivot",  # r4
    "events_grouping_sets",  # r4
    "user_tier_scd2",  # r4
    "events_compaction_plan",  # r4
    "events_column_stats",  # r4
    "event_value_histogram_quantiles",  # r4
    "orders_integrity_checks",  # r4
    "sql_priority_counts",  # r4
    "sql_nation_customer_stats",  # r4
    "sql_lineitem_by_quantity_band",  # r4
    "doc_span_dedup",  # r5
    "doc_quality_classifier",  # r5
    "token_count_min_sketch",  # r5
    "doc_text_knn",  # r5
    "corpus_curation_v2",  # r5
    "doc_dedup_sweep",  # r5
    "doc_url_dedup",  # r5
    "doc_weighted_sample",  # r5
    "doc_perplexity_bucket",  # r5
    "knn_ivf_pq",  # r5
    "doc_exact_substring_dedup",  # r5
    "doc_tokenizer_fertility",  # r5
    "corpus_token_budget_plan",  # r5
    "doc_lsh_recall_report",  # r5
    "events_tier_point_in_time",  # r5
    "events_zorder_layout",  # r5
)
# Rotated OUT of the prefix this round: the nine r9 first-evidence
# entries (trainers + sampled fits, all hash-green r9), the two r3-aged
# queries and the 17 r4-cohort entries regraded r9. Evidence ages after
# this round's grading: r5 remainder (12), then r6 (26) / r7 (28) /
# r8 (28) / r9 (50 incl. the 22 gates regraded every round).
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
