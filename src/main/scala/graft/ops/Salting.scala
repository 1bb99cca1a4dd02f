package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations.
  *
  * A hot key (one customer with 10% of all fact rows) turns a shuffle
  * join into a single straggler task. Salting splits each hot key into
  * `salts` sub-keys: the big side gets a deterministic salt per row, the
  * small side is exploded across all salt values, and the join key
  * becomes (key, salt) — the hot partition fans out `salts`-wide.
  * AQE's skew-join split handles moderate skew automatically; salting is
  * the explicit tool for the pathological key you know about.
  */
object Salting {

  /** Deterministic per-row salt in [0, salts): hash of the whole row's
    * key plus a disambiguator column if provided. */
  private def saltCol(key: Column, disambig: Column, salts: Int): Column =
    pmod(hash(key, disambig), lit(salts))

  /** Salted inner equi-join: `big` keeps one row per input row with a
    * computed salt; `small` is replicated `salts` times. Result equals
    * the plain join exactly — salting only changes the partitioning.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, salts: Int, disambigCol: String): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      saltCol(col(bigKey), col(disambigCol), salts))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
        saltedBig("__salt") === saltedSmall("__salt"))
      .drop(saltedSmall(smallKey)).drop("__salt")
  }

  /** Two-phase salted aggregation: partial per (key, salt), then final
    * per key — the fan-out stage absorbs the hot key's volume. For
    * associative aggregates this equals direct groupBy exactly (and
    * Spark's own partial aggregation already does this per-partition;
    * explicit salting matters when the SHUFFLED partials are still
    * skewed, e.g. huge distinct-value state per key).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int,
                disambigCol: String): DataFrame =
    df.withColumn("__salt", saltCol(col(key), col(disambigCol), salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("double").as("total"))
}
