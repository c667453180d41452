"""Streaming → warehouse mart maintenance.

The missing piece between the reference's print-sink demos and a real
warehouse: a continuously maintained, partitioned, queryable mart. The
idiom: update-mode streaming aggregate → foreachBatch → *dynamic partition
overwrite* of only the partitions the micro-batch touched.

Correctness constraint (learned the hard way, see
tests/test_streaming.py::test_mart_upsert_incremental_two_batches): the
partition columns MUST be the aggregate's full grouping key. Update mode
emits only changed rows; overwriting a partition that is coarser than the
grouping key (e.g. day-partitioning hourly windows) would drop that
partition's unchanged groups. With partition == group key, each overwrite
replaces exactly the changed group's row(s), which makes the sink
idempotent under micro-batch replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert_partitions_foreachbatch(
    agg: DataFrame,
    path: str,
    partition_cols: list[str],
):
    """Maintain a partitioned parquet mart from an update-mode streaming agg.

    `partition_cols` must equal the aggregate's grouping columns (see module
    docstring). Each micro-batch dynamically overwrites only the partitions
    (= groups) whose values changed.
    """

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # foreachBatch does NOT cache the micro-batch frame: every action
        # re-executes the streaming aggregate behind it, and this body
        # takes two (isEmpty probe, the overwrite). Materialize once per
        # batch — localCheckpoint, not persist(): persisting a stateful
        # micro-batch plan hits attribute-rebinding errors on later
        # actions, while the eager checkpoint (the streaming top-N body's
        # proven idiom) severs the plan entirely. The checkpointed blocks
        # are group-count-sized and freed by the context cleaner when the
        # batch-local reference drops.
        batch_df = batch_df.localCheckpoint(eager=True)
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.repartition(*partition_cols)
                .write.mode("overwrite")
                .partitionBy(*partition_cols)
                .parquet(path)
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(per_batch)
        .trigger(availableNow=True)
        .start()
    )


def merge_upsert_foreachbatch(
    agg: DataFrame,
    path: str,
    key_cols: list[str],
    n_buckets: int = 64,
):
    """MERGE-style keyed upsert for update-mode streaming aggregates whose
    grouping key is too fine to be a partition column (e.g. a per-user CDC
    snapshot: one partition per user would mean millions of directories).

    The table is partitioned by ``bucket = pmod(xxhash64(key), n_buckets)``
    — a FIXED partition count independent of key cardinality. Each
    micro-batch:

      1. buckets the changed rows,
      2. reads back ONLY the touched buckets (partition pruning),
      3. anti-joins out the old versions of the changed keys,
      4. dynamically overwrites just those buckets with old-kept ∪ new.

    Per-batch IO is proportional to the touched buckets' size, never the
    snapshot — the scale-safe replacement for a complete-mode re-emission,
    which rewrites ALL state every micro-batch (a killer at 100 TB of
    keys). The merged slice is staged through parquet before the overwrite:
    the anti-join reads the same path the overwrite rewrites, and staging
    (rather than localCheckpoint) both breaks that cycle and avoids leaking
    a cached block per micro-batch.

    Without an ACID table format this is the classic parquet MERGE idiom;
    with Delta/Iceberg available the body becomes a single ``MERGE INTO``
    with identical semantics.
    """
    from pyspark.sql import functions as F

    staging = path.rstrip("/") + "__staging"

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # foreachBatch re-executes the update-mode aggregate behind
        # batch_df for EVERY action, and this body takes four (isEmpty,
        # the touched-bucket collect, the anti-join's key distinct, the
        # staging write). Materialize once per batch via an eager
        # localCheckpoint — the agg runs once instead of 4x (guide §5
        # reused intermediate; persist() is unusable here, it breaks
        # attribute rebinding on stateful micro-batch plans).
        batch_df = batch_df.localCheckpoint(eager=True)
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        new = batch_df.withColumn(
            "bucket", F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets))
        )
        # ≤ n_buckets small ints — collecting them buys STATIC partition
        # pruning on the read-back (isin on the partition column), which a
        # join-based semi filter would only get via runtime DPP.
        touched = [
            r["bucket"] for r in new.select("bucket").distinct().collect()
        ]
        # Existence is checked EXPLICITLY (Hadoop FS, works for any scheme):
        # a broad try/except around the read would misclassify transient FS
        # errors / corrupt footers as "first batch" and silently rewrite the
        # touched buckets with only the new rows, dropping merged history.
        # Any read failure on an existing table must propagate so the
        # micro-batch fails and retries. "Exists" means COMMITTED data, not
        # a bare directory: a write killed between directory creation and
        # the first committed part file leaves an empty/_temporary-only dir,
        # and a directory-existence test would then make every replay of
        # the batch fail on schema inference forever — that state is a
        # first batch.
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        has_data = fs.exists(hpath) and any(
            not st.getPath().getName().startswith(("_", "."))
            for st in fs.listStatus(hpath)
        )
        if has_data:
            existing = (
                spark.read.parquet(path)
                .filter(F.col("bucket").isin(touched))
                # parquet partition-column inference narrows the bucket
                # longs to int32 on read-back; cast back before the union
                .withColumn("bucket", F.col("bucket").cast("long"))
                .join(
                    new.select(*key_cols).distinct(), key_cols, "left_anti"
                )
            )
            merged = existing.unionByName(new)
        else:
            merged = new  # first micro-batch: table does not exist yet
        merged.write.mode("overwrite").parquet(staging)
        staged = spark.read.parquet(staging)
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                staged.repartition("bucket")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(path)
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(per_batch)
        .trigger(availableNow=True)
        .start()
    )
