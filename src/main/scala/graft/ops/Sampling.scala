package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed dataset splitting and sampling for
  * training pipelines.
  *
  * The split key is a hash of CONTENT (not row position or RNG state), so
  * assignment is stable across reruns, repartitions, and engines — the
  * property that keeps a train/test split honest when the corpus is
  * rebuilt. Buckets come from the first 4 hex chars of md5 (16 bits,
  * uniform), available identically in any engine with md5.
  */
object Sampling {

  /** Uniform [0, 100) bucket from content md5. */
  def hashBucket(key: Column): Column =
    (conv(substring(md5(key), 1, 4), 16, 10).cast("int") % 100).cast("int")

  /** Adds `bucket` and `split` (train/test) columns keyed on `key`. */
  def trainTestSplit(df: DataFrame, key: Column, trainPct: Int = 80): DataFrame =
    df.withColumn("bucket", hashBucket(key))
      .withColumn("split", when(col("bucket") < trainPct, "train").otherwise("test"))

  /** Deterministic content-keyed sample: keep rows whose bucket falls
    * under `pct`. Unlike df.sample(), re-running or repartitioning never
    * changes membership. */
  def deterministicSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucket(key) < pct)

  /** Fine-grained [0, 10000) bucket — the quality-weighted sampler needs
    * ~4 decimal places of keep-probability resolution, not percent.
    * (Like [[hashBucket]], the modulo leaves the first 5536 buckets one
    * 1/65536-slot heavier — deterministic, engine-replayable, and
    * irrelevant at per-mille sampling granularity.) */
  def hashBucket10k(key: Column): Column =
    (conv(substring(md5(key), 1, 4), 16, 10).cast("long") % 10000L).cast("long")

  /** Quality-WEIGHTED deterministic sampling: a row's keep probability
    * IS its score in [0,1] (the standard data-selection move — keep the
    * cleanest data with certainty, down-weight the tail instead of hard
    * thresholding), with content-keyed membership: keep iff
    * bucket/10000 < score. Same rerun/repartition stability story as
    * [[deterministicSample]] — no RNG, no seed, same row set on every
    * engine. The comparison formula (bucket cast to double, divided by
    * 10000.0, strictly less) must be replayed verbatim by any oracle.
    *
    * Output columns `bucket` and `is_kept` are RESERVED: withColumn
    * would silently overwrite same-named input columns, so their
    * presence is rejected up front. */
  def qualityWeightedSample(df: DataFrame, key: Column,
                            score: Column): DataFrame = {
    Seq("bucket", "is_kept").foreach { c =>
      require(!df.columns.contains(c),
        s"qualityWeightedSample writes reserved output column '$c'; " +
          "rename or drop the input column of that name first")
    }
    df.withColumn("bucket", hashBucket10k(key))
      .withColumn("is_kept",
        col("bucket").cast("double") / lit(10000.0) < score)
  }

  /** Deterministic STRATIFIED sample: per-stratum keep-percentages (e.g.
    * downsample the dominant language, keep all of the rare ones) with
    * content-keyed membership. The fraction map rides along as a literal
    * — no shuffle, no RNG, and the same row set on every engine/rerun;
    * `df.stat.sampleBy`'s seeded Bernoulli draw gives none of that.
    * Strata absent from the map keep `defaultPct`. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       pctByStratum: Map[String, Int],
                       defaultPct: Int = 100): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(stratum === s, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(key) < pct)
  }

  /** Temperature-scaled mixture ALLOCATION — the T5/PaLM-style sampling
    * plan a multi-source pretraining run starts from: per-domain token
    * budgets ∝ (domain share)^τ, which up-weights small domains
    * relative to proportional sampling. τ is fixed at 0.5 so the power
    * is `sqrt` — the one power IEEE 754 requires CORRECTLY ROUNDED in
    * every engine (`pow(x, 0.7)` is last-ulp implementation-defined;
    * `sqrt` is not), keeping the whole plan bit-replayable.
    *
    * Exactness discipline: weights are re-quantized to the 1e-6 grid
    * (w6 = round(sqrt(share)·1e6), HALF_UP, positive domain), summed
    * exactly as longs; allocations use TRUNCATING integer division of
    * budget·w6 by Σw6 with LARGEST-REMAINDER rounding (ties broken by
    * source name), so Σ alloc_tokens == budget EXACTLY — an allocation
    * plan that doesn't sum to the budget is a subtle downstream bug.
    * Cost: one groupBy bounded by the domain count; the remainder
    * window orders #domains rows (bounded — never row-scaled). Three
    * driver folds of one scalar each (the k-means collect discipline). */
  def temperatureAllocation(docs: DataFrame, stratum: Column, tokensOf: Column,
                            budget: Long = 100000L): DataFrame = {
    val t = docs.groupBy(stratum.as("source"))
      .agg(sum(tokensOf.cast("long")).as("n_tokens"))
      .localCheckpoint(true) // three passes below; domain-count sized
    val tt = t.agg(sum(col("n_tokens"))).head().getLong(0)
    val w = t.withColumn("w6",
      round(sqrt(col("n_tokens").cast("double") / lit(tt.toDouble))
        * lit(1000000.0)).cast("long"))
    val sumW = w.agg(sum(col("w6"))).head().getLong(0)
    val a = w
      .withColumn("alloc", expr(s"(${budget}L * w6) DIV ${sumW}L"))
      .withColumn("rem", expr(s"(${budget}L * w6) % ${sumW}L"))
    val leftover = budget - a.agg(sum(col("alloc"))).head().getLong(0)
    val byRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("source").asc) // #domains rows only
    a.withColumn("rn", row_number().over(byRem))
      .select(col("source"), col("n_tokens"), col("w6").as("weight6"),
        (col("alloc") + when(col("rn") <= leftover, 1L).otherwise(0L))
          .as("alloc_tokens"))
  }
}
