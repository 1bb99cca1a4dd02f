package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global id assignment — the "give every training example a
  * dense 0..n-1 index" step (shard addressing, sample bookkeeping) —
  * WITHOUT a global sort.
  *
  * A single `row_number() OVER (ORDER BY ...)` funnels every row through
  * one partition: the anti-pattern at 100 TB. Instead: bucket rows by
  * range arithmetic on the order column, aggregate per-bucket counts
  * (tiny), prefix-sum those counts into bucket offsets with a window
  * over the BUCKET table (one row per bucket, not per row), broadcast
  * the offsets back, and number within buckets. Per-bucket windows are
  * bounded by the bucket width; the only single-partition work is the
  * offsets prefix sum, whose input is #buckets rows.
  */
object Ids {

  /** Dense 0-based `global_id` following (orderCol, tieCol) order.
    * `bucketWidth` is the order-key range per bucket — choose it so one
    * bucket's rows fit an executor comfortably. Deterministic: same
    * data, same ids, any partitioning. */
  def contiguousIds(df: DataFrame, orderCol: Column, tieCol: Column,
                    bucketWidth: Long = 1024): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val withB = df.withColumn("id_bucket",
      floor(orderCol.cast("long") / lit(bucketWidth)).cast("long"))
    val offsets = withB.groupBy(col("id_bucket"))
      .agg(count(lit(1)).as("bucket_n"))
      .withColumn("bucket_offset",
        coalesce(
          sum(col("bucket_n")).over(Window.orderBy(col("id_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("bucket_n")
    val w = Window.partitionBy(col("id_bucket"))
      .orderBy(orderCol.asc, tieCol.asc)
    withB.join(broadcast(offsets), "id_bucket")
      .withColumn("global_id",
        col("bucket_offset") + row_number().over(w).cast("long") - 1)
      .drop("id_bucket", "bucket_offset")
  }
}
