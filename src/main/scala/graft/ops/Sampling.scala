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
}
