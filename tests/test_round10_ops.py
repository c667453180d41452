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
