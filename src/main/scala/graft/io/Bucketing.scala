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

  /** Join two tables bucketed on the same key with the same bucket count:
    * planner sees compatible output partitioning and elides both
    * exchanges (asserted in BucketingSpec). */
  def cocolocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
