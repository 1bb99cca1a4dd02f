package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter pre-filtering — the runtime-filter pattern for joins
  * where the probe side is huge and the build side's key set fits a
  * sketch but not a broadcast hash table.
  *
  * The build side's keys are folded into a BloomFilter (distributed
  * aggregation via DataFrameStatFunctions), the filter is broadcast, and
  * the probe side drops non-members BEFORE its shuffle. False positives
  * (rate `fpp`) pass through and are eliminated by the real join that
  * follows; false negatives cannot occur, so the pre-filter never changes
  * join results — it only shrinks the shuffled volume to
  * |matches| + fpp * |probe|.
  */
object BloomJoin {

  /** Build a bloom filter over `keys` of `build`. */
  def buildFilter(build: DataFrame, key: String, expectedItems: Long,
                  fpp: Double = 0.01): BloomFilter =
    build.stat.bloomFilter(key, expectedItems, fpp)

  /** Probe-side membership predicate for a prebuilt filter. */
  def mightContain(filter: BloomFilter, key: Column): Column = {
    val f = filter // serialized once into the closure, broadcast with the task
    udf((k: Long) => f.mightContainLong(k)).apply(key)
  }

  /** String-key variant of [[mightContain]] (bloom over text shingles,
    * URLs, …). */
  def mightContainString(filter: BloomFilter, key: Column): Column = {
    val f = filter
    udf((k: String) => k != null && f.mightContainString(k)).apply(key)
  }

  /** Semi-join `probe` to `build` on the given keys with a bloom
    * pre-filter ahead of the exact semi-join shuffle. Result is EXACTLY
    * the plain left_semi join (the exact join removes false positives).
    */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                    buildKey: String, expectedItems: Long,
                    fpp: Double = 0.01): DataFrame = {
    val filter = buildFilter(build, buildKey, expectedItems, fpp)
    probe.filter(mightContain(filter, col(probeKey)))
      .join(build, col(probeKey) === build(buildKey), "left_semi")
  }
}
