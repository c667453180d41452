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

BASE_REPR = (
    "concat(' ', array_join(transform(split(text, ' '), "
    "w -> regexp_replace(w, '(.)', '$1 ')), '| '))"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark("train-bpe")
    from pyspark.sql import functions as F

    from data_warehouse_flink_spark.io import table

    docs = table(spark, sf_dir, "documents")
    repr_df = docs.select(F.expr(BASE_REPR).alias("r")).localCheckpoint(
        eager=True
    )

    merges: list[tuple[str, str]] = []
    for rank in range(n_merges):
        top = (
            # token array materialized once per row — split() inside the
            # lambda re-tokenizes per pair position, O(tokens²)/doc
            # (measured 47x at sf0.1 on the registered gate twin)
            repr_df.select(F.split(F.trim(F.col("r")), " ").alias("_t"))
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(_t) - 1),"
                        " i -> struct(element_at(_t, i) AS a,"
                        " element_at(_t, i + 1) AS b))"
                    )
                ).alias("p")
            )
            .select("p.a", "p.b")
            .filter((F.col("a") != "|") & (F.col("b") != "|"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        repr_df = repr_df.select(
            F.expr(f"replace(r, ' {a} {b} ', ' {a}{b} ')").alias("r")
        ).localCheckpoint(eager=True)
        print(f"rank {rank}: ({a!r}, {b!r}) count={top[0]['c']}")

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
