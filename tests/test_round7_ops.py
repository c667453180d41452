"""Round-7 operator semantics pins.

Round 7 swaps the n-gram Jaccard inverted-index join key from the raw
shingle string to xxhash64(gram) IN PLACE (the gram never reaches the
output, so the hash only renames the shuffle key — VERDICT r6 #3). The
pin: byte-identical pair tables with `hash_grams` on and off, through
both the uncapped and the df-capped (hot-correction) arms.
"""

from __future__ import annotations

import conftest  # noqa: F401  (sys.path setup)
from pyspark.sql import functions as F

SF = conftest.SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _grams(spark):
    from data_warehouse_flink_spark.functions.dedup import word_ngrams
    from data_warehouse_flink_spark.plans.llm_ops import _docs

    return word_ngrams(_docs(spark, SF), n=3)


def test_jaccard_hash_key_identical_uncapped(spark):
    from data_warehouse_flink_spark.functions.dedup import jaccard_pairs

    g = _grams(spark)
    assert _rows(jaccard_pairs(g, threshold=0.3, hash_grams=True)) == _rows(
        jaccard_pairs(g, threshold=0.3, hash_grams=False)
    )


def test_jaccard_hash_key_identical_through_hot_correction(spark):
    """A tiny df_cap pushes most grams through the hot-correction arm —
    the hashed key must survive the rare/hot split + count-join add-back
    byte-identically (threshold 0 keeps every candidate pair visible)."""
    from data_warehouse_flink_spark.functions.dedup import jaccard_pairs

    g = _grams(spark)
    hashed = jaccard_pairs(g, threshold=0.0, df_cap=3, hash_grams=True)
    strung = jaccard_pairs(g, threshold=0.0, df_cap=3, hash_grams=False)
    rows = _rows(hashed)
    assert rows == _rows(strung)
    assert len(rows) > 0


def test_jaccard_hash_key_shuffles_longs_not_strings(spark):
    """Plan-shape guard: with hash_grams on, every gram column in the
    executed plan is bigint (`gram#NL`) — the hash is applied BEFORE the
    checkpoint, so no string-typed gram survives to any join/exchange."""
    import re

    from data_warehouse_flink_spark.functions.dedup import jaccard_pairs

    plan = (
        jaccard_pairs(_grams(spark), threshold=0.3, hash_grams=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    refs = re.findall(r"gram#\d+(L?)", plan)
    assert refs and all(suffix == "L" for suffix in refs)


def test_url_dedup_hash_arm_identical_to_string_arm(spark):
    """The xxhash64-keyed url-dedup default (VERDICT r6 #4; 1.8× at 1M
    URLs) must match the string-keyed arm byte-for-byte — any divergence
    is a 64-bit canonical-URL collision."""
    from data_warehouse_flink_spark.plans.llm_ops import _url_dedup_frame

    assert _rows(_url_dedup_frame(spark, SF, hash_key=True)) == _rows(
        _url_dedup_frame(spark, SF, hash_key=False)
    )


def test_minhash_verify_hashed_sets_identical(spark):
    """verify_jaccard_on_candidates with hashed gram sets (default) must
    reproduce the string-set jaccard byte-for-byte: set sizes and
    intersections are invariant under an injective-w.h.p. hash."""
    from data_warehouse_flink_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        verify_jaccard_on_candidates,
        word_ngrams,
    )
    from data_warehouse_flink_spark.plans.llm_ops import _docs

    grams = word_ngrams(_docs(spark, SF), n=3)
    cands = lsh_candidate_pairs(
        minhash_signatures(grams, 64, gram_hash="md5"), 16, 4
    )
    hashed = verify_jaccard_on_candidates(cands, grams, 0.3, hash_grams=True)
    strung = verify_jaccard_on_candidates(cands, grams, 0.3, hash_grams=False)
    rows = _rows(hashed)
    assert rows == _rows(strung)
    assert len(rows) > 0


def test_ngram_novelty_hash_arm_identical_to_string_arm(spark):
    """doc_ngram_novelty's xxhash64-keyed default (1.78× at 1M
    near-unique-gram docs) must match the string-keyed arm
    byte-for-byte — the gram is a pure shuffle key here."""
    from data_warehouse_flink_spark.plans.llm_ops import _ngram_novelty_frame

    assert _rows(_ngram_novelty_frame(spark, SF, hash_grams=True)) == _rows(
        _ngram_novelty_frame(spark, SF, hash_grams=False)
    )
