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


def all_queries() -> dict[str, Query]:
    load_all()
    return dict(_REGISTRY)


def spark_queries() -> dict[str, SparkQuery]:
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracles() -> dict[str, str]:
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
