"""Round-10 operator pins: the batched-BPE driver gate's designed
fixture (VERDICT r9 #3) and the sampled-fit quantizer sample-rate sweep
operating points (VERDICT r9 #2)."""

from __future__ import annotations

import conftest  # noqa: F401  (sys.path setup)
from pyspark.sql import functions as F

SF = conftest.SF_SMOKE


def test_bpe_batch_fixture_sql_is_engine_portable(spark):
    """`_BPE_BATCH_FIXTURE_SQL` is ONE string evaluated by both engines
    (the _KMEANS_SAMPLE_SQL discipline) — pin that Spark SQL and DuckDB
    produce identical designed texts over one full doc_id cycle (lcm of
    the %8 word pick and %3 repeat = 24)."""
    import duckdb

    from data_warehouse_flink_spark.plans.llm_ops import (
        _BPE_BATCH_FIXTURE_SQL,
    )

    spark_rows = [
        (r.doc_id, r.text)
        for r in spark.range(24)
        .withColumnRenamed("id", "doc_id")
        .select("doc_id", F.expr(_BPE_BATCH_FIXTURE_SQL).alias("text"))
        .orderBy("doc_id")
        .collect()
    ]
    duck_rows = duckdb.connect().execute(
        f"SELECT doc_id, {_BPE_BATCH_FIXTURE_SQL} AS text "
        "FROM range(24) t(doc_id) ORDER BY doc_id"
    ).fetchall()
    assert spark_rows == duck_rows
    # the design actually holds: 8 words over 16 distinct characters
    words = {t for _, text in spark_rows for t in text.split(" ")}
    assert words == {"ax", "by", "cz", "dw", "ev", "fu", "gs", "hr"}
    assert len(set("".join(words))) == 16


def test_bpe_batched_gate_equals_sequential_on_fixture(spark):
    """The registered batched gate's load-bearing claim: on the designed
    disjoint-head corpus, batched(batch_size=4) == the sequential
    Sennrich loop (which is what the shared oracle CTE chain unrolls).
    Disjoint pairs keep their counts under each other's merges, so the
    greedy epoch accept can never reorder — pinned here so a fixture or
    kernel change that breaks the construction fails locally before the
    driver's hash gate sees it."""
    from data_warehouse_flink_spark.functions.text import (
        bpe_train_merges,
        bpe_train_merges_batched,
    )
    from data_warehouse_flink_spark.plans.llm_ops import (
        _BPE_BATCH_FIXTURE_SQL,
        _BPE_TRAIN_MERGES,
        _docs,
    )

    designed = (
        _docs(spark, SF)
        .select(F.expr(_BPE_BATCH_FIXTURE_SQL).alias("text"))
        .localCheckpoint(eager=True)
    )
    batched = bpe_train_merges_batched(
        designed, _BPE_TRAIN_MERGES, batch_size=4
    )
    seq = bpe_train_merges(designed, _BPE_TRAIN_MERGES)
    assert batched == seq
    assert len(batched) == _BPE_TRAIN_MERGES
    # every merge is first-level (two single characters): the corpus was
    # designed so all 8 accepts happen in exactly two 4-accept epochs
    assert all(len(a) == 1 and len(b) == 1 for _, a, b, _c in batched)
    assert [r[0] for r in batched] == list(range(_BPE_TRAIN_MERGES))


def test_md5_sample_sql_generator(spark):
    """The sweep's rate generator reproduces the FROZEN 1/2-rate
    predicate byte-for-byte (the graded sampled-fit oracles embed that
    constant — drift here would make the sweep measure a different
    sample than the gates serve), and each rate selects a deterministic
    non-vacuous subset with the expected nesting."""
    from data_warehouse_flink_spark.plans.llm_ops import (
        _KMEANS_SAMPLE_SQL,
        _embs_wide,
        _md5_sample_sql,
    )

    assert _md5_sample_sql(2) == _KMEANS_SAMPLE_SQL
    assert _md5_sample_sql(1) == "substr(md5(CAST(vec_id AS STRING)), 1, 1) IN " + (
        "('" + "', '".join("0123456789abcdef") + "')"
    )
    assert _md5_sample_sql(64).startswith(
        "substr(md5(CAST(vec_id AS STRING)), 1, 2) IN ('00', '01', '02', '03')"
    )
    embs = _embs_wide(spark, SF)
    n = {
        d: embs.filter(F.expr(_md5_sample_sql(d))).count()
        for d in (1, 2, 4, 16, 64)
    }
    assert n[1] == embs.count()
    # nested prefixes: each denominator's sample contains the next's
    assert n[1] > n[2] > n[4] > n[16] > n[64] > 0


def test_sampled_fit_operating_point(spark):
    """The chosen sampled-fit operating point (VERDICT r9 #2, SCALING.md
    round-10 table): at the 1/16 rate both quantizer families stay above
    their measured recall floors, and the admissibility RULE — a rate is
    usable for a family iff the sample has at least that family's
    codebook k rows — holds at whatever SF the suite runs. The sweep is
    fully deterministic (md5 sample, integer Lloyd, fixed tie-breaks),
    so the floors are margins over pinned values, not flaky
    measurements."""
    from data_warehouse_flink_spark.plans.llm_ops import (
        _KMEANS_K,
        _PQ_TRAIN_K,
        _embs_wide,
        sampled_fit_recall_sweep,
    )

    rows = sampled_fit_recall_sweep(
        _embs_wide(spark, SF), denominators=(16, 64)
    )
    by = {(t, d): (sn, ppm) for t, d, sn, _h, _n, ppm in rows}

    # operating point 1/16: measured 330k/380k (sf0.001/sf0.01) IVF and
    # 110k/160k PQ — floors leave ~30% margin
    sn, ivf16 = by[("ivf_trained_sampled", 16)]
    assert sn >= _KMEANS_K and ivf16 >= 250_000
    sn, pq16 = by[("pq_trained_sampled", 16)]
    assert sn >= _PQ_TRAIN_K and pq16 is not None and pq16 >= 80_000

    # admissibility rule at 1/64: inadmissible exactly when the sample
    # is smaller than the family's k (14 rows < 16 PQ codewords at the
    # 500-vector SFs; both admissible at sf0.1's 2000 vectors)
    sn, ivf64 = by[("ivf_trained_sampled", 64)]
    assert (ivf64 is None) == (sn < _KMEANS_K)
    sn, pq64 = by[("pq_trained_sampled", 64)]
    assert (pq64 is None) == (sn < _PQ_TRAIN_K)


def test_md5_sample_sql_rejects_non_power_of_two():
    """A non-power-of-two denominator can never divide a hex-prefix
    space — the generator must raise, not search lengths forever."""
    import pytest

    from data_warehouse_flink_spark.plans.llm_ops import _md5_sample_sql

    for bad in (0, -2, 3, 6, 100):
        with pytest.raises(ValueError):
            _md5_sample_sql(bad)
    assert _md5_sample_sql(8).count("'") == 4  # 2 prefixes of 1 hex char
