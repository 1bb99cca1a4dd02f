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
      // band-bucket occupancy -> candidate pair volume
      val banded = hashes.select(col("doc_id"),
        explode(array((0 until 4).map { b =>
          val src = if (b < 2) col("ahash_lo") else col("ahash_hi")
          struct(lit(b).as("band"),
            shiftright(src, (b % 2) * 16).bitwiseAND(lit(0xffffL)).as("v"))
        }: _*)).as("bv"))
      val occ = banded.groupBy("bv.band", "bv.v").count()
      val cand = occ.agg(sum(col("count") * (col("count") - 1)).cast("long")).first.getLong(0) / 2
      val pairs = graft.ops.Multimodal.imageNearDupPairs(hashes).count()
      println(s"P76 $dir images=$n distinct_hashes=$nd candidates=$cand pairs_le3=$pairs")
    }
    spark.stop()
  }
}
