package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off analysis of the p76 band join at amplified scale (dev). */
object P76Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val hashes = graft.ops.Multimodal.imageAHash(spark,
        graft.ops.Multimodal.syntheticImages(spark, docs)).toDF()
        .localCheckpoint()
      val n = hashes.count()
      val nd = hashes.select("ahash_lo", "ahash_hi").distinct().count()
      // band-bucket occupancy -> candidate pair volume (the operator's
      // own band decomposition, so this analysis cannot diverge from it)
      val banded = graft.ops.BandedHamming.bandedFrame(hashes.select(
        col("doc_id"), col("ahash_lo").as("lo"), col("ahash_hi").as("hi")))
      val occ = banded.groupBy("band", "v").count()
      val cand = occ.agg(sum(col("count") * (col("count") - 1)).cast("long")).first.getLong(0) / 2
      val pairs = graft.ops.Multimodal.imageNearDupPairs(hashes).count()
      println(s"P76 $dir images=$n distinct_hashes=$nd candidates=$cand pairs_le3=$pairs")
    }
    spark.stop()
  }
}
