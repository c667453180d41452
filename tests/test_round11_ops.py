"""Round-11 pins: the callable sampled-fit acceptance gate (VERDICT r10
#2) and the ADVICE r10 hardening of the sweep harness (explicit
admissibility vs misconfiguration, zero-ground-truth guard, BPE oracle
substitution assert)."""

from __future__ import annotations

import conftest  # noqa: F401  (sys.path setup)
import pytest
from pyspark.sql import functions as F

SF = conftest.SF_SMOKE


def _brute(spark, embs):
    from data_warehouse_flink_spark.functions.similarity import knn_bruteforce

    queries = embs.filter(F.col("vec_id") < 20)
    return (
        knn_bruteforce(embs, queries, k=5)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )


def test_sampled_fit_admissible_verdicts(spark):
    """SCALING.md's minimum-admissible rules as an executable check
    (VERDICT r10 #2): every verdict branch of `sampled_fit_admissible` —
    production size floor, the pinned 1/16 operating point, a binding
    recall floor, the existential floor — plus the family validation."""
    from data_warehouse_flink_spark.plans.llm_ops import (
        _KMEANS_K,
        _PQ_TRAIN_K,
        _SAMPLED_FIT_FLOORS,
        _embs_wide,
        sampled_fit_admissible,
    )

    embs = _embs_wide(spark, SF)
    brute = _brute(spark, embs)

    # (a) PRODUCTION defaults: the suite corpora (500–2,000 vectors) sit
    # below IVF's 128·k = 1,024-row size floor at 1/4 by construction —
    # inadmissible for SIZE even though recall is measured and healthy
    # (the gate reports the measurement either way)
    v = sampled_fit_admissible(embs, 4, "ivf", brute=brute)
    assert not v["admissible"] and v["reason"] == "sample below size floor"
    assert v["recall_ppm"] is not None and v["recall_ppm"] > 0
    assert v["size_floor"] == _SAMPLED_FIT_FLOORS["ivf"][0] == 128 * _KMEANS_K

    # (b) the pinned 1/16 operating point with the small-SF harness
    # override documented in the docstring: admissible, same recall
    # floors as test_sampled_fit_operating_point
    v = sampled_fit_admissible(
        embs, 16, "ivf", size_floor=_KMEANS_K, brute=brute
    )
    assert v["admissible"] and v["reason"] == ""
    assert v["recall_ppm"] >= 250_000 == v["floor_ppm"]
    v = sampled_fit_admissible(
        embs, 16, "pq", size_floor=_PQ_TRAIN_K, brute=brute
    )
    assert v["admissible"] and v["recall_ppm"] >= 80_000 == v["floor_ppm"]

    # (c) the recall floor binds: an unreachable floor fails with the
    # recall reason, not a size reason
    v = sampled_fit_admissible(
        embs, 16, "ivf", floor_ppm=1_000_001, size_floor=1, brute=brute
    )
    assert not v["admissible"] and v["reason"] == "recall below floor"

    # (d) 1/64 PQ: inadmissible at every suite SF — existentially at the
    # 500-vector SFs (14 rows < k=16), below the 256-row size floor at
    # sf0.1 (≈31 rows); the reason must match which floor actually bound
    v = sampled_fit_admissible(embs, 64, "pq", brute=brute)
    assert not v["admissible"]
    if v["recall_ppm"] is None:
        assert v["sample_n"] < _PQ_TRAIN_K
        assert v["reason"] == "sample below existential floor (k)"
    else:
        assert v["sample_n"] < v["size_floor"]
        assert v["reason"] == "sample below size floor"

    with pytest.raises(ValueError, match="family"):
        sampled_fit_admissible(embs, 2, "opq", brute=brute)


def test_sweep_misconfiguration_fails_loudly(spark):
    """ADVICE r10: the sweep's inadmissible-rate handling is an explicit
    sample_n-vs-k check, so a trainer ValueError from MISCONFIGURATION
    (here pq_kmeans_fused_train's dim-vs-m_subspaces*sub_dim guard on
    8-dim vectors) propagates instead of being reported as an
    inadmissible rate with recall None."""
    from data_warehouse_flink_spark.plans.llm_ops import (
        sampled_fit_recall_sweep,
    )

    short = (
        spark.range(64)
        .withColumnRenamed("id", "vec_id")
        .withColumn(
            "embedding",
            F.expr(
                "transform(sequence(1, 8), i -> "
                "CAST(pmod(xxhash64(vec_id * 8 + i), 100) AS DOUBLE) / 100.0)"
            ),
        )
    )
    with pytest.raises(ValueError, match="dims"):
        sampled_fit_recall_sweep(short, denominators=(1,))


def test_sweep_requires_ground_truth(spark):
    """ADVICE r10: an `embs` frame with no vec_id below n_queries has no
    brute-force ground truth — the sweep must raise its own clear
    ValueError up front, not ZeroDivisionError deep in the recall math."""
    from data_warehouse_flink_spark.plans.llm_ops import (
        sampled_fit_recall_sweep,
    )

    shifted = (
        spark.range(100, 200)
        .withColumnRenamed("id", "vec_id")
        .withColumn(
            "embedding",
            F.expr(
                "transform(sequence(1, 64), i -> "
                "CAST(pmod(xxhash64(vec_id * 64 + i), 100) AS DOUBLE) / 100.0)"
            ),
        )
    )
    with pytest.raises(ValueError, match="ground truth"):
        sampled_fit_recall_sweep(shifted, denominators=(2,))


def test_bpe_oracle_substitution_guard(monkeypatch):
    """ADVICE r10: _bpe_train_oracle substitutes text_sql via
    str.replace on _BPE_REPR_SQL's literal spelling; if that spelling
    drifts the replace silently no-ops and the batched gate's oracle
    would train on raw `text`. The guard must turn that silent no-op
    into an AssertionError (and stay quiet for the default text_sql,
    where no substitution is requested)."""
    import data_warehouse_flink_spark.plans.llm_ops as llm_ops

    # the load-bearing path: a non-default text_sql really substitutes
    sql = llm_ops._bpe_train_oracle(text_sql="'xy'")
    assert "string_split('xy'" in sql
    assert "string_split(text" not in sql

    drifted = llm_ops._BPE_REPR_SQL.replace(
        "string_split(text", "string_split( text"
    )
    assert drifted != llm_ops._BPE_REPR_SQL
    monkeypatch.setattr(llm_ops, "_BPE_REPR_SQL", drifted)
    with pytest.raises(AssertionError, match="no-oped"):
        llm_ops._bpe_train_oracle(text_sql="'xy'")
    # default text_sql never trips the guard, even on a drifted spelling
    assert "m7" in llm_ops._bpe_train_oracle()
