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


# The driver grades a fixed-size prefix of the registry (50 entries in both
# r1 and r2, in ``queries()`` iteration order), so iteration order decides
# which queries get oracle evidence each round. Priority for round 3:
# (1) the 22 SURVEY §2 gate queries — all touched by the TIMESTAMP_NTZ fix,
#     need re-grading to prove restoration;
# (2) tpch_q12 — oracle hash fix needs driver confirmation;
# (3) every query never graded in r1/r2 (llm_ops tail, the full analytics
#     suite, one sql_frontend representative) — VERDICT r2 "Next round" #6.
# Everything else (r2-hash-green TPC-H, r1-graded llm_ops, two deferred
# sql_frontend demos) follows in registration order; rotate next round.
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
    # -- hash-fix confirmation --
    "tpch_q12",
    # -- never graded in r1 or r2 --
    "knn_ivf",
    "doc_unigram_logprob",
    "doc_prefix_edit_distance",
    "doc_dup_clusters",
    "doc_tfidf",
    "doc_stratified_sample",
    "streaming_distinct_pairs",
    "doc_pack_sequences",
    "embedding_label_centroids",
    "events_rollup",
    "events_cube",
    "event_value_percentiles",
    "viewers_never_purchased",
    "user_running_value",
    "windowed_value_sum",
    "pattern_error_next_error",
    "pattern_click_followed_by_purchase",
    "user_value_outliers",
    "conversion_funnel",
    "hourly_counts_gapfilled",
    "weekly_cohort_retention",
    "error_rate_spikes",
    "purchase_asof_click",
    # -- round-3 additions (first oracle evidence) --
    "doc_repetition_score",
    "doc_pii_redact",
    "doc_contamination",
    "corpus_mixture_weights",
)
# Deferred past the graded-50 horizon this round (rotate back next):
# events_pivot / events_grouping_sets (events_rollup+cube cover the family),
# event_value_percentiles_approx (rows-only → weak evidence), the
# sql_frontend demos, r2-hash-green TPC-H, r1-graded llm_ops.


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
