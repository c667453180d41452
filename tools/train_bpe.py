"""One-time BPE merge-table training: freeze merge ranks as code.

Production BPE tokenizers train the merge table ONCE offline and then apply
the frozen ranks to any corpus scale — training is the small job, encoding is
the scale path (same discipline as tools/train_ivf_centroids.py /
train_pq_codebooks.py). This tool runs the classic pair-counting loop
(Sennrich et al. 2016) as Spark aggregations over the sf0.001 documents and
emits `functions/bpe_merges.py`, the literal merge list both the Spark
`doc_bpe_encode` query and its generated DuckDB oracle embed.

Representation: each document becomes ``' c h a r s | n e x t '`` — words
char-spaced, joined by the ``|`` word-boundary token merges never cross,
flanked by single spaces. A merge (a, b) is applied as the global
leftmost-non-overlapping string replacement ``' a b ' -> ' ab '``, which both
engines implement identically.

Usage: python tools/train_bpe.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_flink_spark.session import get_spark  # noqa: E402

def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark("train-bpe")
    from data_warehouse_flink_spark.io import table

    docs = table(spark, sf_dir, "documents")

    from data_warehouse_flink_spark.functions.text import bpe_train_merges

    rows = bpe_train_merges(docs, n_merges)
    merges = [(a, b) for _, a, b, _ in rows]
    for rank, a, b, c in rows:
        print(f"rank {rank}: ({a!r}, {b!r}) count={c}")

    out = Path(__file__).resolve().parents[1] / (
        "data_warehouse_flink_spark/functions/bpe_merges.py"
    )
    body = ",\n    ".join(f"({a!r}, {b!r})" for a, b in merges)
    out.write_text(
        '"""Frozen BPE merge table (generated file).\n\n'
        f"Trained by tools/train_bpe.py ({len(merges)} merges, sf0.001\n"
        "documents); embedded as literals by BOTH the Spark `doc_bpe_encode`\n"
        "query and its generated DuckDB oracle so subword splits are\n"
        'engine-exact. Rank order matters. Do not hand-edit.\n"""\n\n'
        f"MERGES: list[tuple[str, str]] = [\n    {body},\n]\n"
    )
    print(f"wrote {out} ({len(merges)} merges)")
    spark.stop()


if __name__ == "__main__":
    main()
