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
# which queries get oracle evidence each round. Priority for round 12
# (VERDICT r11 directives #1 and #2):
# (1) the 22 SURVEY §2 gate queries — stay in every round's prefix;
# (2) first-evidence entries FIRST (the documented rule since r8):
#     none this round — the registry stays frozen at 176 (VERDICT r11 #6)
#     and round 12 adds no registered queries.
# (3) periodic-reconfirmation cadence (rule since r7: after first-evidence
#     entries, fill the prefix with the queries holding the OLDEST driver
#     hash evidence, ties broken by registration order, so no query's
#     evidence age is unbounded). AMENDED in r12 (VERDICT r11 #2):
#     ORACLE-LESS entries are SKIPPED when filling the prefix — a rows-only
#     slot can only ever return ``err: "no_oracle"`` (r11 burned 2 of its 50
#     slots this way on doc_span_dedup_fast / doc_exact_substring_dedup_fast;
#     their hash evidence flows through the oracle-bearing ``*_contract``
#     queries instead). ``all_queries()`` enforces this structurally: it
#     sorts oracle-less entries after every oracle-bearing one, and refuses
#     an oracle-less name in _GRADING_PRIORITY outright. This round: the
#     full r6-evidence remainder of 12, then the first 16 of the r7 cohort
#     of 28 in registration order — exactly the plan VERDICT r11 #1 names.
# 22 + 0 + 12 + 16 = 50 exactly, all oracle-bearing. After this round's
# grading no oracle-bearing query's evidence is older than r7. Next up
# (round 13): the r7 remainder of 12 (tpch_q6/q5/q10/... already regraded
# here; remainder = embedding_dedup_cosine, knn_bruteforce, doc_token_stats,
# doc_fingerprint, doc_language_id, corpus_curation, doc_bpe_tokens,
# doc_chunks, doc_unigram_logprob, doc_prefix_edit_distance,
# doc_simhash_recall_report, event_value_percentiles_approx), then the
# first 16 of the r8 cohort in registration order.
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
    # -- oldest-evidence reconfirmation: the r6 remainder of 12, then the
    # first 16 of the r7 cohort (evidence CORRECTNESS_r06/r07;
    # registration order; oracle-less entries skipped per the r12 cadence
    # amendment — none occur in these cohorts anyway) --
    "embedding_standardize",  # r6
    "doc_ngram_novelty",  # r6
    "doc_length_histogram",  # r6
    "streaming_rollup_incremental",  # r6
    "events_late_arrival_profile",  # r6
    "streaming_user_tier_scd2",  # r6
    "events_quarantine",  # r6
    "user_churn_training_set",  # r6
    "events_weekday_hour_heatmap",  # r6
    "orders_customer_mart",  # r6
    "streaming_weekday_hour_heatmap",  # r6
    "sql_top_customer_per_nation",  # r6
    "uv_sketch_mergeable",  # r7
    "tpch_q5",  # r7
    "tpch_q6",  # r7
    "order_priority_count",  # r7
    "tpch_q10",  # r7
    "tpch_q14",  # r7
    "tpch_q19",  # r7
    "tpch_q17",  # r7
    "tpch_q13",  # r7
    "tpch_q22",  # r7
    "tpch_q12",  # r7
    "tpch_q15",  # r7
    "tpch_q16",  # r7
    "tpch_q20",  # r7
    "doc_dedup_exact",  # r7
    "doc_ngram_jaccard",  # r7
)
# Rotated OUT of the prefix this round: the r5 remainder of 12 and the r6
# cohort head of 16 (all regraded r11, incl. the two no_oracle slots the
# cadence amendment retires). Evidence ages after this round's grading:
# r7 remainder (12), then r8 (28) / r9 (28) / r10 (28) / r11 (26 non-gate
# entries regraded r11; the 22 gates regrade every round).
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
