package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the greatest
  * right timestamp <= the left timestamp, per key — the time-series
  * enrichment primitive (trades->quotes, clicks->views) that Spark has no
  * built-in operator for.
  *
  * Composition strategy (preference ladder (a), SURVEY.md §7.4): an
  * inner range join filtered to prior-rows, collapsed with a max(struct)
  * partial aggregation, left-joined back. Exact, but the range join's
  * pair volume is O(|left| x |right|) per key in the worst case.
  *
  * `nearestPriorBucketed` is the 100 TB path: both sides bucket by
  * floor(ts / width); each right row is replicated to every bucket it can
  * serve within a bounded lookback `horizon`, so the join is a pure
  * equi-join on (key, bucket) and pair volume tracks rows-per-horizon,
  * not rows-per-key. Semantics: identical to the exact form RESTRICTED to
  * matches within `horizon` (an explicit, documented bound — unbounded
  * lookback cannot scale and usually is not wanted).
  */
object AsOfJoin {

  /** Exact nearest-prior join.
    *
    * @param leftId unique left row id column
    * @param key equality key column (same name both sides)
    * @param leftTs / rightTs event-time columns
    * Right columns are carried as `payload` (renamed as given).
    */
  def nearestPrior(left: DataFrame, right: DataFrame, leftId: String, key: String,
                   leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val l = left.as("l")
    val r = right.as("r")
    val matches = l.join(r,
        col(s"l.$key") === col(s"r.$key") && col(s"r.$rightTs") <= col(s"l.$leftTs"),
        "inner")
      .groupBy(col(s"l.$leftId").as(leftId))
      .agg(max(struct((rightTs +: payload).map(c => col(s"r.$c")): _*)).as("m"))
      .select(col(leftId) +: (rightTs +: payload).map(c => col(s"m.$c").as(c)): _*)
    left.join(matches, Seq(leftId), "left")
  }

  /** Horizon-bounded, bucketed nearest-prior join (the scale path). */
  def nearestPriorBucketed(left: DataFrame, right: DataFrame, leftId: String, key: String,
                           leftTs: String, rightTs: String, payload: Seq[String],
                           horizonSec: Long, bucketSec: Long): DataFrame = {
    require(bucketSec > 0 && horizonSec >= bucketSec)
    val nRepl = (horizonSec / bucketSec).toInt + 1
    val lb = left.withColumn("__bucket", (unix_micros(col(leftTs)) / lit(bucketSec * 1000000L)).cast("long"))
    // right row at bucket b serves left buckets b .. b + horizon/width
    val rb = right
      .withColumn("__rb", (unix_micros(col(rightTs)) / lit(bucketSec * 1000000L)).cast("long"))
      .withColumn("__bucket", explode(sequence(col("__rb"), col("__rb") + lit(nRepl))))
      .drop("__rb")
    val l = lb.as("l"); val r = rb.as("r")
    val matches = l.join(r,
        col(s"l.$key") === col(s"r.$key") && col("l.__bucket") === col("r.__bucket") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") &&
        unix_micros(col(s"l.$leftTs")) - unix_micros(col(s"r.$rightTs")) <= lit(horizonSec * 1000000L),
        "inner")
      .groupBy(col(s"l.$leftId").as(leftId))
      .agg(max(struct((rightTs +: payload).map(c => col(s"r.$c")): _*)).as("m"))
      .select(col(leftId) +: (rightTs +: payload).map(c => col(s"m.$c").as(c)): _*)
    left.join(matches, Seq(leftId), "left")
  }
}
