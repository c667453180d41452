"""Round-8 pins.

1. MATCH_RECOGNIZE sugar (`operators/patterns.py::match_recognize`): the
   SQL:2016 row-pattern spelling must compile to EXACTLY the Pattern
   builder's plans — pinned value-identical against the registered
   `login_fail_triple_cep` gate (strict, repeated variable) and against a
   directly-built relaxed Pattern (followedBy) on the same inputs.
2. The fast-tier contract gates must actually FAIL when a tier diverges —
   a contract that can only say TRUE proves nothing, so the negative arm
   is pinned here with a deliberately perturbed "fast" frame.
"""

from __future__ import annotations

import conftest  # noqa: F401  (sys.path setup)
import pytest
from pyspark.sql import functions as F

SF = conftest.SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _events(spark):
    from data_warehouse_flink_spark.plans.reference_jobs import _events

    return _events(spark, SF)


def test_match_recognize_strict_equals_cep_gate(spark):
    """pattern="A A A" over errors == the registered triple-CEP gate
    (same lag-chain plan, same rows; only the step names differ)."""
    from data_warehouse_flink_spark.operators.patterns import match_recognize
    from data_warehouse_flink_spark.plans.reference_jobs import (
        login_fail_triple_cep,
    )

    sugar = match_recognize(
        _events(spark),
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern="A A A",
        define={"A": "event_type = 'error'"},
        within="24 hours",
    )
    assert list(sugar.columns) == ["user_id", "A_us", "A2_us", "A3_us"]
    gate = login_fail_triple_cep(spark, SF)
    assert _rows(sugar) == _rows(gate)
    assert _rows(sugar), "strict sugar matched nothing at all"


def test_match_recognize_relaxed_equals_builder(spark):
    """pattern="CLICK -> PURCHASE" == Pattern.begin.followed_by.detect
    with the same predicates and bound."""
    from data_warehouse_flink_spark.operators.patterns import (
        Pattern,
        match_recognize,
    )

    ev = _events(spark)
    sugar = match_recognize(
        ev,
        partition_by="user_id",
        order_by="ts",
        pattern="CLICK -> PURCHASE",
        define={
            "CLICK": "event_type = 'click'",
            "PURCHASE": F.col("event_type") == "purchase",  # Column form
        },
        within="30 minutes",
    )
    direct = (
        Pattern.begin("CLICK", F.col("event_type") == "click")
        .followed_by("PURCHASE", F.col("event_type") == "purchase")
        .within(1800)
        .detect(ev, "user_id", "ts")
    )
    assert _rows(sugar) == _rows(direct)
    assert _rows(sugar), "relaxed sugar matched nothing at all"


def test_match_recognize_rejects_bad_specs(spark):
    from data_warehouse_flink_spark.operators.patterns import match_recognize

    ev = _events(spark)
    with pytest.raises(ValueError, match="DEFINE"):
        match_recognize(
            ev, "user_id", "ts", "A B", {"A": "true"}, "1 hours"
        )
    with pytest.raises(ValueError, match="exactly"):
        match_recognize(
            ev, "user_id", "ts", "A -> B C",
            {"A": "true", "B": "true", "C": "true"}, "1 hours",
        )
    with pytest.raises(ValueError, match="within"):
        match_recognize(
            ev, "user_id", "ts", "A A", {"A": "true"}, "1 fortnight"
        )
    with pytest.raises(ValueError, match="at least two"):
        match_recognize(ev, "user_id", "ts", "A", {"A": "true"}, "1 hours")


def test_tier_identity_contract_detects_divergence(spark):
    """The contract's negative arm: perturb one row of the 'fast' side and
    `identical` must flip to False (exceptAll is a multiset compare, so a
    single changed value shows up in both difference directions)."""
    from data_warehouse_flink_spark.functions.dedup import span_dedup
    from data_warehouse_flink_spark.plans.llm_ops import (
        _docs,
        _tier_identity_contract,
    )

    docs = _docs(spark, SF)
    gate = span_dedup(docs, hash_key=False)
    good = _tier_identity_contract(span_dedup(docs, hash_key=True), gate)
    row = good.collect()[0]
    assert row["identical"] is True and row["n_rows"] > 0

    perturbed = span_dedup(docs, hash_key=True).withColumn(
        "n_spans", F.col("n_spans") + 1
    )
    bad = _tier_identity_contract(perturbed, gate).collect()[0]
    assert bad["identical"] is False
    assert bad["n_rows"] == row["n_rows"]


def test_minhash_contract_detects_foreign_pair(spark):
    """The subset contract must reject a pair that brute force never
    produced (or produced with a different score)."""
    from data_warehouse_flink_spark.functions.dedup import minhash_lsh_dedup
    from data_warehouse_flink_spark.plans.llm_ops import (
        _candidate_pairs,
        _docs,
        _minhash_subset_contract,
        _trigram_grams,
    )

    fast = minhash_lsh_dedup(
        _docs(spark, SF),
        threshold=0.3,
        gram_hash="xxhash64",
        grams=_trigram_grams(spark, SF),
    )
    brute = _candidate_pairs(spark, SF)
    good = _minhash_subset_contract(fast, brute).collect()[0]
    assert good["subset_with_equal_scores"] is True
    assert good["n_bruteforce_pairs"] > 0

    foreign = spark.createDataFrame(
        [(999_999_998, 999_999_999, 0.5)],
        schema=fast.schema,
    )
    bad = _minhash_subset_contract(
        fast.unionByName(foreign), brute
    ).collect()[0]
    assert bad["subset_with_equal_scores"] is False
    assert bad["n_bruteforce_pairs"] == good["n_bruteforce_pairs"]


def test_dsir_contract_detects_gram_drift(spark):
    """The DSIR invariants contract must flip when the fast tier's gram
    totals drift (extra doc / changed per-doc count both red)."""
    from data_warehouse_flink_spark.plans.llm_ops import (
        _dsir_invariants_contract,
        _dsir_weights,
    )

    gate = _dsir_weights(spark, SF, bucket_hash="md5")
    fast = _dsir_weights(spark, SF, bucket_hash="xxhash64")
    good = _dsir_invariants_contract(gate, fast).collect()[0]
    assert good["per_doc_grams_match"] is True
    assert good["n_docs"] > 0 and good["total_grams"] > 0

    drifted = fast.withColumn("n_grams", F.col("n_grams") + 1)
    bad = _dsir_invariants_contract(gate, drifted).collect()[0]
    assert bad["per_doc_grams_match"] is False
    assert bad["n_docs"] == good["n_docs"]


def test_global_row_number_matches_window_reference(spark):
    """The distributed two-phase numbering must equal the single-partition
    window spelling exactly — including with skewed/duplicate-free keys in
    adversarial input order."""
    from pyspark.sql import Window

    from data_warehouse_flink_spark.operators.layout import global_row_number

    df = (
        spark.range(10_000)
        .withColumn("k", F.xxhash64("id"))
        .repartition(17)  # adversarial input layout
    )
    got = global_row_number(df, ["k", "id"], pos_col="pos")
    want = df.withColumn(
        "pos", F.row_number().over(Window.orderBy("k", "id")).cast("long")
    )
    assert _rows(got.select("id", "k", "pos")) == _rows(
        want.select("id", "k", "pos")
    )


def test_global_row_number_has_no_single_partition_exchange(spark):
    """The whole point: the data never concentrates. The final plan reads
    the checkpointed range layout (the range exchange is inside the
    checkpoint, so it cannot appear here); the per-partition offsets are
    computed driver-side from the partition-count list and come back as a
    broadcast — NO SinglePartition exchange anywhere, and no Window."""
    from data_warehouse_flink_spark.operators.layout import global_row_number

    df = spark.range(50_000).withColumn("k", F.xxhash64("id"))
    out = global_row_number(df, ["k", "id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan
    assert "BroadcastExchange" in plan  # offsets return as a broadcast
    # and the pre-checkpoint layout stage IS a range exchange
    staged = (
        df.repartitionByRange(8, F.col("k"), F.col("id"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in staged


# --------------------- in-engine k-means trainer (llm_ops k-means gates) ----


def test_kmeans_quantized_matches_numpy_replica(spark):
    """The distributed Lloyd loop must equal an independent single-process
    replica exactly — same quantization, same argmin tie-break, same
    floored-mean update — at sf0.001. This is the trainer's ground-truth
    pin; the DuckDB oracle re-proves it per-SF via unrolled CTEs."""
    import math

    import numpy as np

    from data_warehouse_flink_spark.functions.clustering import (
        kmeans_quantized_train,
        quantize_embeddings,
    )
    from data_warehouse_flink_spark.plans.llm_ops import _embs

    qdf = quantize_embeddings(_embs(spark, SF))
    got = kmeans_quantized_train(qdf, k=8, iters=3)

    rows = sorted(qdf.collect(), key=lambda r: r["vec_id"])
    q = np.array([r["q"] for r in rows], dtype=np.int64)
    cents = q[:8].copy()
    for _ in range(3):
        # argmin with (dist, cell) tie-break
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cell = d.argmin(axis=1)  # numpy argmin ties -> first index
        new = []
        for c in range(8):
            members = q[cell == c]
            if len(members):
                new.append(
                    [math.floor(s / len(members)) for s in members.sum(axis=0)]
                )
            else:
                new.append(list(cents[c]))
        cents = np.array(new, dtype=np.int64)
    assert got == [list(map(int, c)) for c in cents]


def test_kmeans_iterations_move_centroids(spark):
    """Non-vacuity: the trained model must differ from its init (a loop
    that never updates would still pass a fixed-point oracle)."""
    from data_warehouse_flink_spark.functions.clustering import (
        kmeans_quantized_train,
        quantize_embeddings,
    )
    from data_warehouse_flink_spark.plans.llm_ops import _embs

    qdf = quantize_embeddings(_embs(spark, SF))
    init = [list(r["q"]) for r in qdf.orderBy("vec_id").limit(8).collect()]
    trained = kmeans_quantized_train(qdf, k=8, iters=3)
    assert trained != init
    # and iterating further from the same init changes the model again
    # (3 iterations have not already converged on this corpus)
    assert trained != kmeans_quantized_train(qdf, k=8, iters=1)


def test_kmeans_assignment_is_map_only(spark):
    """The serving scan must stay shuffle-free: centroids ride as literals
    (frozen_ivf_assign's idiom), so the assignment plan may contain no
    Exchange at all past the cached input."""
    from data_warehouse_flink_spark.functions.clustering import (
        assign_quantized_cells,
    )
    from data_warehouse_flink_spark.plans.llm_ops import (
        _kmeans_model,
        _kmeans_qdf,
    )

    df = assign_quantized_cells(
        _kmeans_qdf(spark, SF), _kmeans_model(spark, SF)
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan


def test_kmeans_trained_index_schema_matches_frozen_index(spark):
    """`knn_ivf` serves either index; the trained table must keep the
    frozen table's exact column contract (vec_id, vecd, norm, cell)."""
    from data_warehouse_flink_spark.plans.llm_ops import (
        _ivf_assigned,
        _kmeans_ivf_assigned,
        _kmeans_qdf,
    )

    frozen = _ivf_assigned(spark, SF)
    trained = _kmeans_ivf_assigned(spark, SF)
    assert set(trained.columns) == set(frozen.columns)
    got = trained.groupBy().agg(
        F.count("*").alias("n"), F.countDistinct("cell").alias("cells")
    ).collect()[0]
    assert got["n"] == _kmeans_qdf(spark, SF).count()
    assert 1 <= got["cells"] <= 8


def test_minhash_incremental_consistent_with_symmetric_gate(spark):
    """The incremental (batch-vs-ledger) path must agree with the
    symmetric gate: every reported match is a doc_minhash_lsh pair that
    crosses the split with the SAME jaccard, and it is the best such pair
    for its batch doc. Also pins the asymmetry itself: doc_id always from
    the batch (≡7 mod 10), match_id always from the corpus."""
    from data_warehouse_flink_spark.plans.llm_ops import (
        doc_minhash_incremental,
        doc_minhash_lsh,
    )

    inc = doc_minhash_incremental(spark, SF).collect()
    assert inc, "expected at least one cross-split near-dup at sf0.001"
    assert all(r["doc_id"] % 10 == 7 for r in inc)
    assert all(r["match_id"] % 10 != 7 for r in inc)

    sym = {}
    for r in doc_minhash_lsh(spark, SF).collect():
        a, b = r["doc_a"], r["doc_b"]
        for x, y in ((a, b), (b, a)):
            if x % 10 == 7 and y % 10 != 7:
                sym.setdefault(x, []).append((y, r["jaccard"]))
    best = {
        d: max(ms, key=lambda m: (m[1], -m[0]))
        for d, ms in sym.items()
    }
    got = {r["doc_id"]: (r["match_id"], r["jaccard"]) for r in inc}
    assert got == best


def test_kmeans_training_iteration_is_single_exchange(spark):
    """The update stage must be scan → partial agg → one k-row exchange:
    the cell rides inline with q (literal centroids), so a second
    Exchange would mean the join-back-of-assignment regression (the
    corpus re-shuffled on id every iteration)."""
    from test_plans import formatted_plan_df

    from data_warehouse_flink_spark.functions.clustering import (
        lloyd_iteration_sums,
    )
    from data_warehouse_flink_spark.plans.llm_ops import (
        _kmeans_model,
        _kmeans_qdf,
    )

    sums = lloyd_iteration_sums(
        _kmeans_qdf(spark, SF), _kmeans_model(spark, SF)
    )
    plan = formatted_plan_df(spark, sums)
    assert plan.count(") Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_pq_trainer_improves_distortion_per_subspace(spark):
    """Every subspace's trained codebook must beat its init (the 16
    lowest-id slices) on total quantization distortion, with the right
    shape (16 codes × 8 dims) — non-vacuity for all M independent Lloyd
    runs. (No superiority claim vs the frozen offline codebooks: those
    converged for many iterations; the gate proves the TRAINING loop.)"""
    from data_warehouse_flink_spark.functions.clustering import (
        assign_quantized_cells,
    )
    from data_warehouse_flink_spark.plans.llm_ops import (
        _pq_sub_qdf,
        _pq_train_model,
    )

    books = _pq_train_model(spark, SF)
    assert len(books) == 8
    for m, book in enumerate(books):
        assert len(book) == 16 and all(len(c) == 8 for c in book)
        qm = _pq_sub_qdf(spark, SF, m)
        init = [list(r["q"]) for r in qm.orderBy("vec_id").limit(16).collect()]

        def cost(cents):
            return assign_quantized_cells(qm, cents).agg(
                F.sum(F.col("dist").cast("decimal(38,0)")).alias("c")
            ).collect()[0]["c"]

        assert cost(book) < cost(init), f"subspace {m}"


def test_signature_width_mismatch_raises(spark):
    """The signature-injection contract's negative arm: a cached table
    whose width differs from the declared num_hashes must raise loudly
    (the silent failure mode was NULL buckets colliding everything)."""
    from data_warehouse_flink_spark.functions.dedup import (
        incremental_minhash_dedup,
        minhash_lsh_dedup,
        minhash_signatures,
        word_ngrams,
    )
    from data_warehouse_flink_spark.plans.llm_ops import _docs

    docs = _docs(spark, SF).limit(50)
    grams = word_ngrams(docs, n=3).localCheckpoint(eager=True)
    sigs32 = minhash_signatures(grams, 32).localCheckpoint(eager=True)
    with pytest.raises(ValueError, match=r"widths in \[32, 32\]"):
        minhash_lsh_dedup(docs, grams=grams, signatures=sigs32)
    with pytest.raises(ValueError, match=r"widths in \[32, 32\]"):
        incremental_minhash_dedup(
            grams, is_batch=F.col("doc_id") % 2 == 0, signatures=sigs32
        )
    # a RAGGED table (bad union: one 64-wide row first, the rest 32) must
    # also raise even though a first()-row probe would pass it (ADVICE r8)
    sigs64_head = minhash_signatures(grams, 64)
    ragged = (
        sigs64_head.limit(1)
        .unionByName(sigs32)
        .localCheckpoint(eager=True)
    )
    with pytest.raises(ValueError, match=r"widths in \[32, 64\]"):
        minhash_lsh_dedup(docs, grams=grams, signatures=ragged)
    # NULL signature rows (outer-join artifact) must raise too — min/max
    # over size() skip NULLs, so they need the dedicated count arm
    with_null = (
        sigs64_head.limit(1)
        .select("doc_id", F.lit(None).cast("array<bigint>").alias("signature"))
        .unionByName(sigs64_head)
        .localCheckpoint(eager=True)
    )
    with pytest.raises(ValueError, match="NULL signature rows"):
        minhash_lsh_dedup(docs, grams=grams, signatures=with_null)
    # the matching width passes through
    sigs64 = minhash_signatures(grams, 64).localCheckpoint(eager=True)
    assert (
        minhash_lsh_dedup(docs, grams=grams, signatures=sigs64).count() >= 0
    )


def test_bpe_trainer_reproduces_frozen_merges(spark):
    """The in-engine BPE trainer at sf0.001 must reproduce the committed
    frozen merge table's first 8 entries EXACTLY — the literals in
    functions/bpe_merges.py are this loop's offline output on this very
    corpus (tools/train_bpe.py), so equality pins the distributed gate
    to the shipped tokenizer, counts-tie-breaks and all."""
    from data_warehouse_flink_spark.functions.bpe_merges import MERGES
    from data_warehouse_flink_spark.plans.llm_ops import corpus_bpe_train

    rows = corpus_bpe_train(spark, SF).orderBy("rank").collect()
    assert [(r["lhs"], r["rhs"]) for r in rows] == MERGES[:8]
    assert [r["rank"] for r in rows] == list(range(8))
    assert all(r["cnt"] > 0 for r in rows)


def test_bpe_trainer_survives_degenerate_docs(spark):
    """Single-symbol and empty documents must be ignored, not crash: under
    ANSI mode (the Spark 4 default) sequence(1, 0) is the DESCENDING
    [1, 0] and element_at(_t, 2) throws — the guard filters docs shorter
    than two symbols before the pair transform, matching the oracle's
    empty generate_series(1, 0). The degenerate rows contribute no pairs,
    so the trained merges equal the clean-corpus merges exactly."""
    from data_warehouse_flink_spark.functions.text import bpe_train_merges

    clean = spark.createDataFrame(
        [("window order",), ("sort sort",)], "text string"
    )
    dirty = clean.unionByName(
        spark.createDataFrame([("",), ("a",), (" ",)], "text string")
    )
    got_clean = bpe_train_merges(clean, 3)
    got_dirty = bpe_train_merges(dirty, 3)
    assert got_clean == got_dirty
    assert len(got_clean) == 3
