package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet star schema (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read parquet
  * directly — scans are columnar, schema comes from parquet footers, and
  * Catalyst pushes filters/projections into the scan (verified in
  * ExplainSpec). At cluster scale the same call reads a partitioned
  * table directory; nothing here assumes local mode.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  /** events.ts has shipped as TIMESTAMP(NANOS) (Spark reads it as a
    * nano-long under spark.sql.legacy.parquet.nanosAsLong=true) and as
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (TIMESTAMP_NTZ under
    * schema inference) in different testdata generations; sessions also
    * set spark.sql.parquet.inferTimestampNTZ.enabled=false so naive
    * micros read directly as TimestampType. This normalizer accepts all
    * three shapes and always yields a UTC-instant TimestampType — every
    * session pins spark.sql.session.timeZone=UTC, so the NTZ cast is
    * value-preserving and matches DuckDB's epoch_us over the naive
    * parquet value. */
  def normalizeTs(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => df
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(load(spark, dir, "events"), "ts")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
