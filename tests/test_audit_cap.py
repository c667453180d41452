"""Non-vacuous engine-vs-oracle check of the embedding_dedup_cosine
audit-slice cap (round 13).

The shipped and generated embeddings tiers never produce a cosine >= 0.9
pair, so the registered query's parity evidence is "both engines emit the
empty set" — true, but it exercises neither the pair math nor the new
per-label cap. This test builds a synthetic embeddings table where BOTH
are load-bearing: duplicate vectors inside the audit slice (pairs must
appear), a duplicate parked beyond the 256th-lowest vec_id of its label
(its pairs must be excluded by the cap), and a third independent
implementation (plain-Python, fold-order-matched) confirming the expected
pair set — the repo's usual Spark / DuckDB / pure-Python triangle.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_warehouse_flink_spark.plans.llm_ops import _DEDUP_COSINE_AUDIT_CAP
from data_warehouse_flink_spark.registry import all_queries

QUERY = all_queries()["embedding_dedup_cosine"]
DIM = 64  # pinned by the oracle's range(1, 65) dot product
PER_LABEL = _DEDUP_COSINE_AUDIT_CAP + 44  # cap must genuinely bind


def _embeddings_table() -> tuple[pa.Table, "np.ndarray", "np.ndarray", "np.ndarray"]:
    rng = np.random.default_rng(1337)
    vec_ids, labels, vecs = [], [], []
    for label, base in ((0, 0), (1, 1000)):
        block = rng.standard_normal((PER_LABEL, DIM)).astype(np.float32)
        # In-slice duplicate pair: ranks 1 and 2 of this label.
        block[1] = block[0]
        # Beyond-cap duplicate of the same vector: rank CAP+25 — pairs
        # (0, cap+24th id) and (1, ...) exist WITHOUT the cap and must be
        # excluded WITH it.
        block[_DEDUP_COSINE_AUDIT_CAP + 24] = block[0]
        vec_ids.extend(range(base, base + PER_LABEL))
        labels.extend([label] * PER_LABEL)
        vecs.append(block)
    vec_arr = np.concatenate(vecs)
    ids = np.asarray(vec_ids, dtype=np.int64)
    labs = np.asarray(labels, dtype=np.int32)
    table = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vec_arr],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(labs, type=pa.int32()),
        }
    )
    return table, ids, labs, vec_arr


def _python_twin(ids, labs, vecs, cap) -> set[tuple[int, int, int]]:
    """(bucket, vec_a, vec_b) pairs with cosine >= 0.9 over the capped
    slice — dot products via a sequential fold to match both engines'
    left-to-right list aggregation exactly."""

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a.astype(np.float64), b.astype(np.float64)):
            acc += float(x) * float(y)
        return acc

    pairs = set()
    for label in np.unique(labs):
        idx = np.where(labs == label)[0]
        idx = idx[np.argsort(ids[idx])][:cap]
        for i_pos, i in enumerate(idx):
            ni = np.sqrt(dot(vecs[i], vecs[i]))
            for j in idx[i_pos + 1 :]:
                c = dot(vecs[i], vecs[j]) / (ni * np.sqrt(dot(vecs[j], vecs[j])))
                if round(c, 6) >= 0.9:
                    pairs.add((int(label), int(ids[i]), int(ids[j])))
    return pairs


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("audit_cap_embs")
    table, ids, labs, vecs = _embeddings_table()
    pq.write_table(table, d / "embeddings.parquet")
    return d, ids, labs, vecs


def test_cap_binds_and_engines_agree(spark, emb_dir):
    d, ids, labs, vecs = emb_dir
    got = sorted(
        (r.bucket, r.vec_a, r.vec_b, r.cosine)
        for r in QUERY.spark_fn(spark, str(d)).collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(QUERY.oracle).fetchall())

    # Engine parity, non-vacuous: exact pair identity, cosines to 1e-9.
    assert len(got) == len(want) and len(got) > 0
    for (gb, ga2, gb2, gc), (wb, wa2, wb2, wc) in zip(got, want):
        assert (gb, ga2, gb2) == (wb, wa2, wb2)
        assert abs(gc - wc) <= 1e-9

    # Third implementation: the pair set is exactly the twin's.
    twin = _python_twin(ids, labs, vecs, _DEDUP_COSINE_AUDIT_CAP)
    assert {(b, a, v) for b, a, v, _ in got} == twin

    # The planted in-slice duplicates are found...
    pair_ids = {(a, b) for _, a, b, _ in got}
    assert (0, 1) in pair_ids and (1000, 1001) in pair_ids
    # ...and every pair respects the cap: no member ranks beyond the
    # 256th-lowest vec_id of its label (the planted beyond-cap duplicate
    # would otherwise pair with vec 0 AND vec 1 in both labels).
    beyond = {0 + _DEDUP_COSINE_AUDIT_CAP + 24, 1000 + _DEDUP_COSINE_AUDIT_CAP + 24}
    assert not any(a in beyond or b in beyond for a, b in pair_ids)


def test_cap_exclusion_is_load_bearing(spark, emb_dir):
    """Sanity that the planted beyond-cap duplicate WOULD pair without the
    cap — i.e. the previous test's exclusion assertion is not vacuous."""
    from data_warehouse_flink_spark.functions.similarity import (
        bucketed_dedup_cosine,
    )
    from data_warehouse_flink_spark.io import table as load_table

    d, *_ = emb_dir
    uncapped = bucketed_dedup_cosine(
        load_table(spark, str(d), "embeddings"), threshold=0.9
    )
    pair_ids = {(r.vec_a, r.vec_b) for r in uncapped.collect()}
    assert (0, _DEDUP_COSINE_AUDIT_CAP + 24) in pair_ids
    assert (1, _DEDUP_COSINE_AUDIT_CAP + 24) in pair_ids
