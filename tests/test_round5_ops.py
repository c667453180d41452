"""Round-5 operator semantics pins."""

from __future__ import annotations

import conftest  # noqa: F401  (sys.path setup)

SF = conftest.SF_SMOKE


def test_dsir_fast_matches_md5_gate_on_hash_independent_columns(spark):
    """doc_importance_weights_fast (xxhash64 buckets) must agree with the
    md5-oracle gate on everything that does not depend on the bucket hash:
    the doc set and each doc's total gram count. The weights themselves
    differ (different bucketing of the same distribution) but keep-rates
    must be in the same ballpark — both are estimating the same DSIR
    log-ratio score."""
    from data_warehouse_flink_spark.plans.llm_ops import (
        doc_importance_weights,
        doc_importance_weights_fast,
    )

    exact = {
        r["doc_id"]: r["n_grams"]
        for r in doc_importance_weights(spark, SF)
        .select("doc_id", "n_grams")
        .collect()
    }
    fast_rows = doc_importance_weights_fast(spark, SF).collect()
    fast = {r["doc_id"]: r["n_grams"] for r in fast_rows}
    assert fast == exact
    keep_rate = sum(r["keep"] for r in fast_rows) / len(fast_rows)
    assert 0.05 < keep_rate < 0.95
