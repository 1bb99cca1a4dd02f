package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffle once at write time so repeated
  * equi-joins and aggregations on the bucket key run with NO exchange.
  * This is the canonical 100 TB pattern for a fact table joined on the
  * same key by many downstream queries — pay one shuffle at ingest,
  * amortize it over every join after.
  *
  * Spark bucketing requires the table catalog (`saveAsTable`); bucket
  * info lives in catalog metadata, not parquet files.
  */
object Bucketing {

  /** Drop a managed table AND its leftover warehouse directory. A fresh
    * metastore with a stale warehouse dir (prior JVM wrote the files, this
    * one never registered the table) makes plain DROP TABLE a no-op while
    * saveAsTable still fails with LOCATION_ALREADY_EXISTS. */
  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$wh/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Write `df` as a bucketed, sorted table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    writeBucketedMulti(df, table, Seq(key), buckets, mode)

  /** Multi-key variant: bucket AND sort on the full key sequence, in
    * order. Needed when the downstream join clusters on several keys —
    * `spark.sql.requireAllClusterKeysForCoPartition` (default true)
    * rejects a partial-key bucket layout for co-partitioned joins, so a
    * table bucketed on a key SUBSET would be silently re-shuffled (and
    * its bucketed scan disabled by the planner), defeating the layout. */
  def writeBucketedMulti(df: DataFrame, table: String, keys: Seq[String],
                         buckets: Int,
                         mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Compact a BUCKETED table back to one file per bucket, preserving
    * the bucket spec — the maintenance companion to append-mode
    * ingestion: every [[writeBucketedMulti]] append lands one more file
    * wave inside the existing buckets, and after enough days the scan's
    * file-open count (not its byte count) becomes the bottleneck.
    * Plain [[graft.io.Sinks.compactParquet]] would destroy the layout
    * (repartition + plain write loses catalog bucket metadata); this
    * reads the spec from the catalog, repartitions on the bucket keys —
    * `repartition(n, keys)` hashes exactly like the bucket layout, so
    * each output task holds exactly one bucket and writes exactly one
    * file — and swaps the rewritten table in under the original name.
    * The drop+rename swap is not atomic (same caveat as any
    * non-transactional table format; the crash-safe two-name protocol
    * lives in [[Ledger]]); run it in the maintenance window that also
    * owns appends. Returns the data file count after compaction. */
  def compactBucketed(spark: SparkSession, table: String): Int = {
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(s"$table is not bucketed"))
    val keys = spec.bucketColumnNames
    val sorts = spec.sortColumnNames
    val tmp = s"${table}_compacting"
    dropTable(spark, tmp)
    // pin the bucketed scan ON for the rewrite: the explicit repartition
    // is elided against the scan's bucket partitioning (zero-shuffle
    // compaction — each task drains one bucket's file wave into one
    // file), but WITHOUT the pin the planner can elide the shuffle AND
    // then demote the scan to a plain file-split read
    // (DisableUnnecessaryBucketedScan sees no join/agg caring), leaving
    // rows bucket-misaligned across tasks — one file per (task, bucket)
    // instead of one per bucket, silently re-fragmenting the table
    val scanKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prevScan = spark.conf.get(scanKey)
    try {
      spark.conf.set(scanKey, "false")
      spark.table(table)
        .repartition(spec.numBuckets,
          keys.map(org.apache.spark.sql.functions.col): _*)
        .write.bucketBy(spec.numBuckets, keys.head, keys.tail: _*)
        .sortBy(sorts.head, sorts.tail: _*)
        .format("parquet")
        .saveAsTable(tmp)
    } finally spark.conf.set(scanKey, prevScan)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    dataFileCount(spark, table)
  }

  /** Count the data files of a managed table (parquet parts, not logs). */
  def dataFileCount(spark: SparkSession, table: String): Int = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(loc).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Join two tables bucketed on the same key with the same bucket count:
    * planner sees compatible output partitioning and elides both
    * exchanges (asserted in BucketingSpec). */
  def cocolocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
