package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-question tool: the round-16 PROBE_SCALING sweep's only two
  * non-flat rows are the STREAMED minhash (q73) and vector (q71)
  * probes at the 80× amplified point — their batch-built twins stay
  * flat on the same corpus, so the suspect is the accumulated
  * batch_id partition count, not candidate volume. This measures the
  * same probes on the same sf0.8 index BEFORE and AFTER
  * `Bucketing.compactBucketed` — if compaction restores the batch
  * economics, the maintenance story (append partials, compact on
  * cadence) is measured, not assumed.
  *
  * Usage: runMain graft.tools.ProbeCompact [ampDir] [reps]
  */
object ProbeCompact {
  def main(args: Array[String]): Unit = {
    val amp = args.lift(0).getOrElse("/tmp/graft_scale/sf0.8")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.io.TempPaths.newWarehouseDir())
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.io.TempPaths.cleanupOnExit(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))

    val corpus = spark.read.parquet(s"$amp/documents.parquet")
      .filter(col("doc_id") % 5 =!= 0)
    val embCorpus = spark.read.parquet(s"$amp/embeddings.parquet")
      .filter(col("vec_id") % 5 =!= 0)
    // the FIXED sf0.01 deltas, as in ProbeScaling
    val delta = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("doc_id") % 5 === 0).localCheckpoint()
    val deltaEmb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("vec_id") % 5 === 0).localCheckpoint()

    def time(mk: () => DataFrame): Seq[Double] = {
      mk().queryExecution.toRdd.count()
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // q73: streamed minhash layout, 3 appended batches
    Seq("pc_bands", "pc_sigs").foreach(graft.io.Bucketing.dropTable(spark, _))
    Seq(0, 1, 2).foreach { i =>
      graft.ops.Dedup.appendCorpusIndexPartial(spark,
        corpus.filter(pmod(col("doc_id"), lit(3)) === i), "pc_bands", "pc_sigs",
        i.toLong)
    }
    val q73Pre = time(() => graft.ops.Dedup.incrementalVerdictsAgainstIndex(
      spark, delta, "pc_bands", "pc_sigs"))
    Seq("pc_bands", "pc_sigs").foreach(graft.io.Bucketing.compactBucketed(spark, _))
    val q73Post = time(() => graft.ops.Dedup.incrementalVerdictsAgainstIndex(
      spark, delta, "pc_bands", "pc_sigs"))

    // q71: streamed vector layout, 3 appended batches
    val bits = graft.ops.Similarity.adaptiveBitsPerTable(embCorpus.count())
    Seq("pc_vbands", "pc_vvecs").foreach(graft.io.Bucketing.dropTable(spark, _))
    Seq(0, 1, 2).foreach { i =>
      graft.ops.Similarity.appendVectorIndexPartial(spark,
        embCorpus.filter(pmod(col("vec_id"), lit(3)) === i), "pc_vbands",
        "pc_vvecs", i.toLong, tables = 8, bitsPerTable = bits)
    }
    // bitsPerTable passed explicitly (as ProbeScaling does): the default
    // re-derives it via a count of the vecs table INSIDE the timed
    // closure — a file-count-bound job compaction itself speeds up,
    // which would confound the very pre/post comparison made here
    val q71Pre = time(() => graft.ops.Similarity.incrementalCosineVerdictsAgainstIndex(
      spark, deltaEmb, "pc_vbands", "pc_vvecs", threshold = 0.45,
      bitsPerTable = bits))
    Seq("pc_vbands", "pc_vvecs").foreach(graft.io.Bucketing.compactBucketed(spark, _))
    val q71Post = time(() => graft.ops.Similarity.incrementalCosineVerdictsAgainstIndex(
      spark, deltaEmb, "pc_vbands", "pc_vvecs", threshold = 0.45,
      bitsPerTable = bits))

    println(f"PROBE_COMPACT q73 pre=${med(q73Pre)}%.3f post=${med(q73Post)}%.3f " +
      f"q71 pre=${med(q71Pre)}%.3f post=${med(q71Post)}%.3f " +
      s"(reps pre73=${q73Pre.map(x => f"$x%.3f").mkString(",")} " +
      s"post73=${q73Post.map(x => f"$x%.3f").mkString(",")} " +
      s"pre71=${q71Pre.map(x => f"$x%.3f").mkString(",")} " +
      s"post71=${q71Post.map(x => f"$x%.3f").mkString(",")})")
    Seq("pc_bands", "pc_sigs", "pc_vbands", "pc_vvecs")
      .foreach(graft.io.Bucketing.dropTable(spark, _))
    spark.stop()
  }
}
