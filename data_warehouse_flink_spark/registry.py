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
# which queries get oracle evidence each round. Priority for round 11
# (VERDICT r10 directive #1):
# (1) the 22 SURVEY §2 gate queries — stay in every round's prefix;
# (2) first-evidence entries FIRST (the documented rule since r8):
#     none this round — the registry is frozen at 176 (VERDICT r10 #5)
#     and round 11 adds no registered queries.
# (3) periodic-reconfirmation cadence (rule since r7: after first-evidence
#     entries, fill the prefix with the queries holding the OLDEST driver
#     hash evidence, ties broken by registration order, so no query's
#     evidence age is unbounded). This round: the full r5-evidence
#     remainder of 12, then the first 16 of the r6 cohort of 28 in
#     registration order — exactly the plan VERDICT r10 #1 names.
# 22 + 0 + 12 + 16 = 50 exactly. Next up (round 12): the r6 remainder
# (embedding_standardize, doc_ngram_novelty, doc_length_histogram,
# streaming_rollup_incremental, events_late_arrival_profile,
# streaming_user_tier_scd2, events_quarantine, user_churn_training_set,
# events_weekday_hour_heatmap, orders_customer_mart,
# streaming_weekday_hour_heatmap, sql_top_customer_per_nation — 12),
# then the r7 cohort head.
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
    # -- oldest-evidence reconfirmation: the r5 remainder of 12, then the
    # first 16 of the r6 cohort (evidence CORRECTNESS_r05/r06;
    # registration order) --
    "streaming_value_histogram_quantiles",  # r5
    "events_key_skew_profile",  # r5
    "events_k_anonymity",  # r5
    "user_cdc_snapshot",  # r5
    "streaming_user_cdc_snapshot",  # r5
    "events_props_json",  # r5
    "events_backfill_plan",  # r5
    "events_sessionize_gap_stats",  # r5
    "events_rollup_incremental",  # r5
    "streaming_sessionize_gap_stats",  # r5
    "events_dq_anomaly",  # r5
    "streaming_dq_anomaly",  # r5
    "login_fail_triple_cep",  # r6
    "tpch_q1",  # r6
    "tpch_q3",  # r6
    "tpch_q18",  # r6
    "tpch_q7",  # r6
    "tpch_q8",  # r6
    "tpch_q2",  # r6
    "tpch_q9",  # r6
    "tpch_q11",  # r6
    "tpch_q21",  # r6
    "doc_span_dedup_fast",  # r6
    "doc_exact_substring_dedup_fast",  # r6
    "doc_exact_substring_dedup_50",  # r6
    "corpus_mixture_resample",  # r6
    "multimodal_shard_plan",  # r6
    "corpus_ccnet_funnel",  # r6
)
# Rotated OUT of the prefix this round: corpus_bpe_train_batched (r10
# first-evidence, hash-green), the r4 tail of 11 and the first 16 of the
# r5 cohort (all regraded r10). Evidence ages after this round's
# grading: r6 remainder (12), then r7 (28) / r8 (28) / r9 (28) /
# r10 (22 non-gate entries regraded r10; the 22 gates regrade every
# round).
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
