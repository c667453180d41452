"""Streaming similarity search: query vectors arrive as a stream and are
ranked against a fixed corpus index — the retrieval shape of an online
curation / RAG-style pipeline (batch twin: `functions/similarity.py`).

Per-query results are independent, so the streamed union is exactly the
batch output regardless of micro-batch boundaries — which makes this the
rare streaming operator with a value-exact SQL oracle (the batch kNN
oracle verbatim, gate `streaming_knn`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_warehouse_flink_spark.functions.similarity import knn_bruteforce


def knn_stream(
    corpus: DataFrame,
    query_stream: DataFrame,
    out_path: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "object":
    """Exact cosine top-k for each streamed query vector.

    The corpus is a *batch* DataFrame captured by the foreachBatch closure
    — materialize it (localCheckpoint / a parquet mart) before passing it
    in so each micro-batch joins the same snapshot without re-deriving the
    lineage. Each batch broadcasts its (small) query set against the
    corpus, exactly like the batch operator; results append to
    ``out_path``. Scale: corpus streams partition-local per batch, state
    is zero (retrieval is stateless), and the only shuffle is the
    per-query rank — batch-size-bounded, never corpus-bounded.
    """

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ranked = knn_bruteforce(
            corpus, batch_df, k=k, id_col=id_col, vec_col=vec_col
        )
        ranked.write.mode("append").parquet(out_path)

    return (
        query_stream.writeStream.outputMode("append")
        .foreachBatch(per_batch)
        .trigger(availableNow=True)
        .start()
    )
