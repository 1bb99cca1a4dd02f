package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent keyed UPSERT from a stream into a partitioned parquet
  * table — the `foreachBatch` MERGE shape for sinks without a
  * transactional streaming commit log (the reference's JDBC mart
  * tables, reference main.py:282-288, are this shape: keyed rows
  * maintained across runs; here re-expressed against the warehouse).
  *
  * Contract: the table holds the LATEST row per (user_id, event_type),
  * "latest" = highest event_id (a per-key version; unique, so the
  * winner is total-order deterministic — no timestamp tie hazard). Each
  * micro-batch:
  *
  *   1. reduces the batch to its per-key best row (struct-max
  *      aggregate — batch-sized work),
  *   2. finds the affected key-bucket partitions (bounded by
  *      `nBuckets`, a driver-sized list by construction),
  *   3. reads the CURRENT table restricted to those partitions
  *      (partition pruning: untouched buckets are never scanned),
  *   4. re-argmaxes old ∪ new and dynamically overwrites ONLY the
  *      affected partitions.
  *
  * Per-batch work is O(|batch| + |affected partitions|), never a full
  * table rewrite — at 100 TB the table rewrite cost tracks the ingest
  * rate, not corpus size, exactly like a Delta/Iceberg MERGE's rewrite
  * set (which this predates and approximates without extra deps).
  *
  * Exactly-once story (the honest foreachBatch one): the sink itself is
  * NOT transactional — a crash can commit some partitions of a batch
  * and not others. Safety comes from the merge being IDEMPOTENT and
  * monotone (argmax by a fixed total order): replaying a batch against
  * any partially-committed state converges to the same table, so
  * checkpoint-WAL replay after a crash repairs torn writes instead of
  * duplicating rows (proved in RecoverySpec; idempotence in
  * StreamingSpec).
  */
object UpsertSink {

  /** Per-key winner under the fixed total order (event_id desc) —
    * struct-max aggregate keyed by (key, bucket): one cell per live
    * key, map-side partial combine, no window over members. */
  private def latestPerKey(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"), col("event_type"), col("u_bucket"))
      .agg(max(struct(col("event_id"), col("ts"), col("value"))).as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.event_id").as("event_id"), col("m.ts").as("ts"),
        col("m.value").as("value"), col("u_bucket"))

  private def tableExists(spark: SparkSession, target: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(target)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.getPath.getName.startsWith("u_bucket="))
  }

  /** One MERGE step: fold `batch` into the keyed table at `target`.
    * Idempotent — merging the same batch twice (or against a partially
    * committed prior attempt) is a no-op the second time. */
  def mergeLatestBatch(batch: DataFrame, target: String,
                       nBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    // u_bucket is the sink's partition column — a caller column of the
    // same name would be silently overwritten (the budgetSelect
    // reserved-column hazard)
    require(!batch.columns.contains("u_bucket"),
      "input must not carry a 'u_bucket' column (reserved by the sink)")
    // null keys would land in the __HIVE_DEFAULT_PARTITION__ bucket and
    // then never match the affected-partition filter — silent row loss;
    // a null version makes the argmax winner undefined. Fail loudly in
    // the codegen'd stream instead (raise_error evaluates per row, no
    // extra pass).
    val guarded = batch
      .withColumn("user_id", when(col("user_id").isNull,
        raise_error(lit("upsert key user_id must be non-null")))
        .otherwise(col("user_id")))
      .withColumn("event_id", when(col("event_id").isNull,
        raise_error(lit("upsert version event_id must be non-null")))
        .otherwise(col("event_id")))
    val best = latestPerKey(guarded.withColumn("u_bucket",
      pmod(col("user_id"), lit(nBuckets)).cast("int")))
    // affected partitions: at most nBuckets values — driver-sized
    val buckets = best.select("u_bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    if (buckets.isEmpty) return
    val merged =
      if (!tableExists(spark, target)) best
      else latestPerKey(spark.read.parquet(target)
        .filter(col("u_bucket").isin(buckets: _*))
        .unionByName(best))
    // materialize BEFORE the overwrite: the plan reads the very
    // partition files the dynamic overwrite is about to replace
    val snap = merged.localCheckpoint()
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(modeKey)
    try {
      spark.conf.set(modeKey, "dynamic")
      snap.write.mode("overwrite").partitionBy("u_bucket").parquet(target)
    } finally {
      spark.conf.set(modeKey, prev)
      snap.unpersist()
    }
  }

  /** Drain an events landing into the keyed table under
    * `Trigger.AvailableNow`: the streaming half of the upsert — the
    * checkpoint WAL sequences batches, `mergeLatestBatch` applies each
    * one idempotently. */
  def runUpsertLatest(events: DataFrame, checkpoint: String, target: String,
                      nBuckets: Int = 16): Unit = {
    val q = events.writeStream
      .foreachBatch((b: Dataset[Row], _: Long) =>
        mergeLatestBatch(b.toDF(), target, nBuckets))
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain an events landing into a KEYED JDBC MART under
    * `Trigger.AvailableNow` — the reference's end state as a PIPELINE:
    * a Spark stream keeping a relational mart current (reference
    * main.py:282-288 appends to MySQL; here each micro-batch flows
    * through [[graft.io.Sinks.upsertLatestJdbc]]'s argmax staging-swap
    * merge instead, so the mart holds the latest row per key). The
    * merge is idempotent and heals its own crash window, so checkpoint
    * replay of a killed batch converges to the uninterrupted run's
    * table — exactly-once in effect through a sink with no
    * transactional coupling to the WAL (RecoverySpec proves it with an
    * injected mid-batch kill through embedded Derby). */
  def runUpsertLatestJdbc(events: DataFrame, checkpoint: String,
                          url: String, table: String, keys: Seq[String],
                          versionCol: String,
                          props: java.util.Properties): Unit = {
    val q = events.writeStream
      .foreachBatch((b: Dataset[Row], _: Long) =>
        graft.io.Sinks.upsertLatestJdbc(b.toDF(), url, table, keys,
          versionCol, props))
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
