package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Probe-side membership predicate for a prebuilt filter.
    *
    * The filter is shipped via `SparkContext.broadcast`, NOT captured in
    * the UDF closure: closures are serialized into every task, while a
    * broadcast variable moves once per executor over the torrent
    * protocol. At the ~GB filter sizes a 100 TB decontamination corpus
    * implies, per-task closure serialization would dominate task launch
    * and can exceed RPC frame limits.
    */
  def mightContain(filter: BloomFilter, key: Column): Column = {
    val bf = SparkSession.active.sparkContext.broadcast(filter)
    udf((k: Long) => bf.value.mightContainLong(k)).apply(key)
  }

  /** String-key variant of [[mightContain]] (bloom over text shingles,
    * URLs, …). */
  def mightContainString(filter: BloomFilter, key: Column): Column = {
    val bf = SparkSession.active.sparkContext.broadcast(filter)
    udf((k: String) => k != null && bf.value.mightContainString(k)).apply(key)
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
