package graft.tools

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the dedup pipeline (dev utility). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
      // operators persist signature frames; isolate each measurement
      spark.catalog.clearCache()
    }

    time("warmup")(docs.count())
    time("signature only") {
      docs.select(col("doc_id"), Dedup.minhashSignature(col("text")).as("sig")).count()
    }
    time("shingles only") {
      docs.select(col("doc_id"), Dedup.shingles(col("text"), 2).as("g")).count()
    }
    time("shingles forced") {
      docs.select(size(Dedup.shingles(col("text"), 2)).as("n")).agg(sum("n")).count()
    }
    time("band bucket skew") {
      val sig = docs.select(col("doc_id"),
        Dedup.minhashSignature(col("text")).as("sig"))
      val banded = sig.select(col("doc_id"),
        explode(org.apache.spark.sql.functions.transform(sequence(lit(0), lit(15)), j =>
          struct(j.as("band_id"),
            hash(j, slice(col("sig"), j * lit(4) + lit(1), lit(4))).as("band_hash")))).as("b"))
        .select(col("doc_id"), col("b.band_id"), col("b.band_hash"))
      val buckets = banded.groupBy("band_id", "band_hash").count()
        .orderBy(col("count").desc)
      buckets.show(5)
      println("PROFILE candidate pair volume = " + buckets
        .agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0))
      banded.count()
    }
    time("full minhashLsh")(Dedup.minhashLsh(docs).count())
    time("minhashLsh 16x8")(Dedup.minhashLsh(docs, bands = 16, rowsPerBand = 8,
      threshold = 0.7).count())
    time("minhashLsh 16x8 tri")(Dedup.minhashLsh(docs, bands = 16, rowsPerBand = 8,
      shingleN = 3, threshold = 0.7).count())
    time("minhashLsh 16x8 tri 2nd")(Dedup.minhashLsh(docs, bands = 16, rowsPerBand = 8,
      shingleN = 3, threshold = 0.7).count())
    locally {
      val k = 128
      val sig = docs.select(col("doc_id"), col("text"),
        Dedup.minhashSignature(col("text"), k, 2).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val banded = sig.select(col("doc_id"),
        explode(org.apache.spark.sql.functions.transform(sequence(lit(0), lit(15)), j =>
          struct(j.as("band_id"),
            hash(j, slice(col("sig"), j * lit(8) + lit(1), lit(8))).as("band_hash")))).as("b"))
        .select(col("doc_id"), col("b.band_id"), col("b.band_hash"))
      time("  banded count")(banded.count())
      val l = banded.as("l"); val r = banded.as("r")
      val candidates = l.join(r,
          col("l.band_id") === col("r.band_id") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("left_id"), col("r.doc_id").as("right_id"))
        .distinct()
      time("  candidates count")(candidates.count())
      val ls = sig.select(col("doc_id").as("left_id"), col("sig").as("lsig"),
        Dedup.shingles(col("text"), 2).as("lgrams"))
      time("  ls grams count")(ls.count())
      val joined = candidates.join(ls, "left_id")
      time("  join ls")(joined.count())
      sig.unpersist()
    }
    time("simhash pairs")(Dedup.simhashPairs(docs, 8).count())
    spark.stop()
  }
}
