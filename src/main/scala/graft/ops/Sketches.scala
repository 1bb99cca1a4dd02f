package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus-profiling sketches — the bounded-state answers
  * to "describe this corpus" questions a 100 TB curation run asks
  * before (and after) every pipeline stage: how many distinct terms per
  * slice, which n-grams dominate, how are document lengths shaped.
  *
  * Every operator here is EXACTLY replayable outside Spark: the KMV
  * sketch's content is "the k smallest 60-bit md5 values" (a pure
  * function of the value set), heavy hitters are exact counts with a
  * bounded top-k fold, and the histogram is integer bin arithmetic —
  * so all three carry full hash oracles where an HLL/t-digest row
  * could only carry a tolerance check. The one non-replayable sketch
  * (count-min, seeded xxhash64) stays a library surface
  * ([[graft.functions.CountMin]]) certified by SketchesSpec's
  * overcount-bound property instead of a catalog oracle.
  */
object Sketches {

  /** 60-bit md5 hash — the engine-independent uniform key
    * (Selection.scala's shuffle-key device: `CAST(('0x' ||
    * substring(md5(x), 1, 15)) AS BIGINT)` in DuckDB). */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-language distinct-token profile: the KMV bottom-k sketch next
    * to the exact count it estimates. At 100 TB the exact side is the
    * expensive labeled baseline (it shuffles every distinct (lang,
    * token) pair — the p11 role); the sketch ships at most k longs per
    * (lang, map task) and is the number a profiling dashboard actually
    * reads. Emitting both, plus the k-th hash itself, makes the row
    * self-certifying: the oracle recomputes sketch content AND
    * estimate, so a hash match proves the bounded-state path, not just
    * the estimate's magnitude. Estimate: size < k means the sketch IS
    * the distinct hash set; otherwise (k-1) * 2^60 / h_(k). */
  def kmvDistinctTokens(docs: DataFrame, k: Int = 64): DataFrame = {
    val toks = docs.select(col("lang"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val sk = toks.select(col("lang"), h60(col("tok")).as("h"))
      .groupBy("lang")
      .agg(graft.functions.KmvAggregator.kmv(k)(col("h")).as("mins"))
    val exact = toks.distinct()
      .groupBy("lang").agg(count(lit(1)).as("n_exact"))
    sk.join(exact, Seq("lang"))
      .select(col("lang"), lit(k).cast("long").as("k"),
        size(col("mins")).cast("long").as("n_sketch"),
        element_at(col("mins"), size(col("mins"))).as("kth_hash"),
        col("n_exact"))
      .withColumn("n_est",
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * pow(lit(2.0), lit(60.0)) /
            col("kth_hash").cast("double"), 3)))
      .withColumn("rel_err",
        round(abs(col("n_est") - col("n_exact")) / col("n_exact"), 6))
  }

  /** STREAMED maintenance for the KMV profile: land one micro-batch's
    * per-language bottom-k sketch as its own batch_id partition —
    * k longs per (language, batch), bounded regardless of batch size.
    * The fold is EXACT, not approximate-on-approximate: the k smallest
    * distinct hashes of a union are always contained in the union of
    * each part's k smallest, so re-folding the partials reproduces the
    * monolithic sketch bit-for-bit (SketchesSpec pins this; the q75
    * catalog row hash-certifies it against p94's oracle). Replay
    * idempotently overwrites its own partition (the q68 discipline). */
  def appendKmvPartial(spark: org.apache.spark.sql.SparkSession,
                       batch: DataFrame, table: String, batchId: Long,
                       k: Int = 64, buckets: Int = 8): Unit = {
    val partial = batch.select(col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("lang"), h60(col("tok")).as("h"))
      .groupBy("lang")
      .agg(graft.functions.KmvAggregator.kmv(k)(col("h")).as("mins"))
      .select(col("lang"), explode(col("mins")).as("h"))
      .withColumn("batch_id", lit(batchId))
    graft.io.Bucketing.repairCompaction(spark, table)
    if (!spark.catalog.tableExists(table)) {
      graft.io.Bucketing.dropTable(spark, table)
      graft.io.Bucketing.writePartitionedBucketed(partial, table,
        "batch_id", "lang", buckets)
      graft.io.Bucketing.stampKind(spark, table, "kmv-profile")
    } else {
      spark.catalog.refreshTable(table)
      graft.io.Bucketing.overwritePartitions(partial, table)
    }
  }

  /** Fold a streamed ([[appendKmvPartial]]) profile back to the
    * per-language sketch and emit [[kmvDistinctTokens]]'s exact output
    * shape: sketch columns from the folded index, the exact baseline
    * from a labeled one-shot pass over `docs` (the expensive
    * comparison column the profile row carries by contract — the
    * SKETCH is the maintained artifact). */
  def kmvProfileFromStreamedIndex(spark: org.apache.spark.sql.SparkSession,
                                  docs: DataFrame, table: String,
                                  k: Int = 64): DataFrame = {
    graft.io.Bucketing.repairCompaction(spark, table)
    graft.io.Bucketing.requireKind(spark, table, "kmv-profile")
    val idx = spark.table(table)
    require(idx.columns.contains("batch_id"),
      s"$table is not a streamed kmv-profile layout (no batch_id partitions)")
    val sk = idx.groupBy("lang")
      .agg(graft.functions.KmvAggregator.kmv(k)(col("h")).as("mins"))
    val exact = docs.select(col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .distinct()
      .groupBy("lang").agg(count(lit(1)).as("n_exact"))
    sk.join(exact, Seq("lang"))
      .select(col("lang"), lit(k).cast("long").as("k"),
        size(col("mins")).cast("long").as("n_sketch"),
        element_at(col("mins"), size(col("mins"))).as("kth_hash"),
        col("n_exact"))
      .withColumn("n_est",
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * pow(lit(2.0), lit(60.0)) /
            col("kth_hash").cast("double"), 3)))
      .withColumn("rel_err",
        round(abs(col("n_est") - col("n_exact")) / col("n_exact"), 6))
  }

  /** Per-language heavy-hitter word n-grams: exact counts, bounded
    * top-k selection. Two hash aggregations (both partial-aggregating
    * map-side) and a k-element fold per language — no global sort, no
    * per-language window over the full gram table (the
    * TopKAggregator rationale). Ties break lexicographically on the
    * gram, so ranks replay exactly. */
  def heavyHitterNgrams(docs: DataFrame, n: Int = 2, k: Int = 10): DataFrame = {
    val grams = docs.select(col("lang"),
      explode(graft.functions.TextFunctions.word_ngrams(
        TextAnalysis.tokens(col("text")), n)).as("gram"))
    grams.groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy("lang")
      .agg(graft.functions.TopKAggregator.top_k_str(k)(
        col("cnt").cast("double"), col("gram")).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("gram"), col("col.score").cast("long").as("cnt"))
  }

  /** Per-language fixed-width histogram of per-document token counts:
    * one tiny min/max aggregate broadcast back, then a map-only bin
    * assignment and a count aggregate — the scale-correct histogram
    * (an equi-DEPTH ntile histogram needs a global sort; fixed-width
    * needs two narrow passes). Bin arithmetic is pure integer work on
    * the closed range [lo, hi]: bin = (v - lo) * bins / (hi - lo + 1),
    * always in [0, bins). Empty bins are absent by construction (the
    * oracle groups the same way). */
  def tokenCountHistogram(docs: DataFrame, bins: Int = 16): DataFrame = {
    val v = docs.select(col("lang"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("v"))
    val bounds = v.groupBy("lang")
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    v.join(broadcast(bounds), Seq("lang"))
      .withColumn("bin",
        floor((col("v") - col("lo")) * bins /
          (col("hi") - col("lo") + lit(1))).cast("long"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("cnt"),
        min(col("v")).as("bin_min"), max(col("v")).as("bin_max"))
      .select(col("lang"), col("bin"), col("cnt"), col("bin_min"),
        col("bin_max"))
  }
}
