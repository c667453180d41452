"""One-time product-quantization training: freeze PQ codebooks as code.

Product quantization compresses a d-dim vector to M small codes by splitting
it into M subvectors and k-means-quantizing each subspace independently —
8 bytes instead of 256 per vector here (M=8 subspaces x K=16 codewords over
64 dims). Like the IVF coarse quantizer, the codebooks train ONCE offline on
a sample and serving encodes/scans against frozen literals; this tool runs a
deterministic Lloyd's k-means (seed 42) over the sf0.01 embeddings and emits
`functions/pq_codebooks.py`, the literal table both the Spark `knn_pq` query
and its generated DuckDB oracle embed. Re-run only to retrain.

Usage: python tools/train_pq_codebooks.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

M_SUBSPACES = 8
K_CODES = 16
N_ITERS = 25
SEED = 42


def lloyd(sub: np.ndarray, k: int, rng: np.random.RandomState) -> np.ndarray:
    """Deterministic Lloyd's k-means on one subspace (float64)."""
    centers = sub[rng.choice(len(sub), size=k, replace=False)].copy()
    for _ in range(N_ITERS):
        d2 = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = sub[assign == j]
            if len(members):
                centers[j] = members.mean(axis=0)
            else:  # re-seed empty cluster deterministically
                centers[j] = sub[rng.randint(len(sub))]
    return centers


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    vecs = np.stack(
        pq.read_table(f"{sf_dir}/embeddings.parquet")
        .column("embedding")
        .to_pylist()
    ).astype(np.float64)
    dim = vecs.shape[1]
    sub_dim = dim // M_SUBSPACES
    rng = np.random.RandomState(SEED)
    books = []
    for m in range(M_SUBSPACES):
        sub = vecs[:, m * sub_dim : (m + 1) * sub_dim]
        centers = lloyd(sub, K_CODES, rng)
        books.append(sorted([float(v) for v in c] for c in centers))

    out = (
        Path(__file__).resolve().parents[1]
        / "data_warehouse_flink_spark"
        / "functions"
        / "pq_codebooks.py"
    )
    book_rows = ",\n".join(
        "    [\n"
        + ",\n".join(
            "        [" + ", ".join(repr(v) for v in c) + "]" for c in book
        )
        + ",\n    ]"
        for book in books
    )
    out.write_text(
        '"""Frozen product-quantization codebooks (generated file).\n\n'
        f"Trained by tools/train_pq_codebooks.py (Lloyd's k-means, "
        f"M={M_SUBSPACES} subspaces x\nK={K_CODES} codewords, seed={SEED}, "
        "sf0.01 embeddings); embedded as literals by BOTH\nthe Spark "
        "`knn_pq` encode/scan and its generated DuckDB oracle so codes and\n"
        'ADC distances are engine-exact. Do not hand-edit.\n"""\n\n'
        f"M_SUBSPACES = {M_SUBSPACES}\nK_CODES = {K_CODES}\n"
        f"SUB_DIM = {sub_dim}\n\n"
        f"CODEBOOKS: list[list[list[float]]] = [\n{book_rows},\n]\n"
    )
    print(f"wrote {out} ({M_SUBSPACES} x {K_CODES} x {sub_dim})")


if __name__ == "__main__":
    main()
