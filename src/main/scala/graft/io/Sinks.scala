package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Mart sinks (reference §2.2): parquet flat + Hive-partitioned, JDBC
  * append. Unlike the reference's DatabaseWriter (database_write.py:16-17,
  * which catches exceptions and returns a message string), failures here
  * PROPAGATE — a silent mart-write failure is data loss.
  *
  * Scale notes: `partitionBy("sales_month","store_id")` gives read-side
  * partition pruning for free; callers should coalesce/repartition by the
  * partition columns first if many small files would result (each task
  * writes one file per partition value it holds).
  */
object Sinks {

  /** Flat parquet write (reference parquet_writer.py:8-19). */
  def writeParquet(df: DataFrame, path: String,
                   mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** Hive-layout partitioned parquet (reference main.py:260-261).
    * Repartitions on the partition columns so each output partition is
    * written by one task — avoids the small-files explosion at scale. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(partitionCols.map(df(_)): _*)
      .write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Compact a parquet dataset to ~`targetFileBytes` output files —
    * small-file hygiene, the maintenance op every long-lived 100 TB
    * table needs (thousands of tiny files turn listing and scan startup
    * into the bottleneck). File count is computed from the ACTUAL input
    * bytes via the Hadoop FileSystem API (scheme-agnostic: file://,
    * hdfs://, s3a://), not guessed. Returns the output file count. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, inDir: String,
                     outDir: String, targetFileBytes: Long = 128L << 20): Int = {
    val in = new org.apache.hadoop.fs.Path(inDir)
    val fs = in.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(in).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    nFiles
  }

  /** JDBC append (reference database_write.py:8-17) — errors propagate. */
  def appendJdbc(df: DataFrame, url: String, table: String,
                 props: java.util.Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  /** JDBC table scan (reference database_read.py:6-10). `partitionOn`
    * splits the read into `numPartitions` parallel range queries — the
    * difference between one executor pulling the whole table and a
    * distributed scan. */
  def readJdbc(spark: org.apache.spark.sql.SparkSession, url: String, table: String,
               props: java.util.Properties,
               partitionOn: Option[(String, Long, Long, Int)] = None): DataFrame =
    partitionOn match {
      case Some((column, lower, upper, numPartitions)) =>
        spark.read.jdbc(url, table, column, lower, upper, numPartitions, props)
      case None => spark.read.jdbc(url, table, props)
    }
}
