"""Smoke: the driver contract in __spark_entry__.py holds."""

from __future__ import annotations

import conftest  # noqa: F401  (sys.path setup)

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"window_end_sec", "user_id", "cnt", "rn"}


def test_queries_and_oracles_aligned():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)
    # every oracle-less query is a deliberate rows-only op
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {
        "uv_approx",
        "doc_minhash_lsh",
        "doc_simhash",
        "knn_lsh",
        "multimodal_features",
        "event_value_percentiles_approx",
        "doc_rolling_fingerprint",
        "knn_ivf",
    }
