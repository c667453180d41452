"""Training-data-pipeline operator library: text analysis, dedup,
similarity search, multimodal column plumbing."""
