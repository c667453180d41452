"""Structured Streaming layer: watermarked windowed aggregations,
applyInPandasWithState kernels, and the foreachBatch top-N idiom."""
