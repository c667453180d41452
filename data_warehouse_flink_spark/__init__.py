"""data_warehouse_flink_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing capabilities of
``tiankx1003/Data-Warehouse-Flink`` (a Flink 1.7 DataStream user-behavior
analytics suite) on the Spark DataFrame / SQL / Structured Streaming stack,
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) such an engine needs at 100 TB.

Layout
------
- ``session``    SparkSession factory with scale-aware defaults
- ``schemas``    StructTypes for every reference bean + the testdata tables
- ``sources``    batch + streaming readers (CSV, apache log, parquet, kafka,
                 seeded generator)
- ``operators``  DataFrame-native operator library (windows, top-N, distinct,
                 joins, stateful detection in batch form)
- ``streaming``  Structured Streaming variants: watermarked windowed aggs,
                 applyInPandasWithState kernels, foreachBatch top-N
- ``functions``  text analysis, dedup (exact/MinHash/SimHash/Jaccard),
                 similarity search, multimodal column plumbing
- ``plans``      assembled query pipelines: the six reference job families
                 and TPC-H-style analytics
- ``registry``   the queries()/oracle_sql() registry consumed by
                 ``__spark_entry__.py`` and the correctness tests
"""

__version__ = "0.1.0"
