"""Streaming corpus curation: the training-data pipeline as a continuous
job — documents arrive as a stream, pass the quality gate, are exactly
deduplicated against *all previously seen content* (stateful
dropDuplicates on the content hash), and land in a partitioned mart.

This is the streaming twin of `plans.llm_ops.corpus_curation`'s first two
stages. Near-dup (MinHash) stays batch-side by design: LSH banding needs
corpus-global signatures, so the standard architecture is continuous
exact-dedup ingest + periodic batch near-dup sweeps over the landed mart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_stream(
    documents: DataFrame,
    min_chars: int = 150,
    langs: tuple[str, ...] = ("en", "zh"),
) -> DataFrame:
    """Quality gate + first-seen exact dedup on a document stream.

    dropDuplicates on the content hash keeps state per distinct hash — at
    100 TB that state lives in RocksDB and is the exact-dedup ledger. No
    watermark bound is applied to the dedup state on purpose: content
    dedup must be global, not time-scoped.
    """
    gated = documents.filter(
        (F.col("n_chars") >= min_chars) & F.col("lang").isin(*langs)
    )
    hashed = gated.withColumn("text_hash", F.md5(F.lower(F.col("text"))))
    return hashed.dropDuplicates(["text_hash"])
