package graft.marts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's two data-mart transforms, re-expressed as reusable
  * DataFrame combinators over an arbitrary (fact, keys) shape.
  *
  * Money policy (SURVEY.md §7.5f): inputs are doubles; every money
  * aggregate casts to DECIMAL(18,2) BEFORE summing so partial-aggregation
  * order cannot perturb low bits (decimal addition is exact and
  * associative), then casts the final value to double for a stable output
  * schema. This is also what makes DuckDB-oracle hash parity exact.
  *
  * Month keys are STRING `substring(cast(date as string),1,7)` — the
  * reference slices strings, it does not use date functions
  * (customer_mart_sql_tranform_write.py:12, sales_data_mart_sql_transform.py:11).
  */
object Marts {

  /** `YYYY-MM` month key by string slicing, reference-faithful. */
  def monthKey(c: Column): Column = substring(c.cast("string"), 1, 7)

  /** Exact money sum: DECIMAL(18,2) in, double out. */
  def moneySum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Customer mart, reference idiom: windowed SUM over the full partition
    * then `distinct()` (customer_mart_sql_tranform_write.py:10-19).
    * Kept for parity/property-testing; `customerMartGrouped` is the
    * plan we ship (one shuffle, partial aggregation map-side).
    */
  def customerMartWindowed(sales: DataFrame, customerId: Column, fullName: Column,
                           dateCol: Column, amount: Column): DataFrame = {
    val withMonth = sales
      .withColumn("sales_month", monthKey(dateCol))
      .withColumn("customer_id", customerId)
      .withColumn("full_name", fullName)
    val w = Window.partitionBy(col("customer_id"), col("sales_month"))
    withMonth
      .withColumn("total_sales",
        sum(amount.cast("decimal(18,2)")).over(w).cast("double"))
      .select(col("customer_id"), col("full_name"), col("sales_month"), col("total_sales"))
      .distinct()
  }

  /** Customer mart, grouped form — provably equal to the windowed form here
    * because every output column is functionally dependent on the grouping
    * keys (property-tested in MartsSpec). groupBy gets map-side partial
    * aggregation: at 100 TB this shuffles one row per (customer, month)
    * per map task instead of every fact row + a full-partition window sort.
    */
  def customerMartGrouped(sales: DataFrame, customerId: Column, fullName: Column,
                          dateCol: Column, amount: Column): DataFrame =
    sales
      .withColumn("sales_month", monthKey(dateCol))
      .withColumn("customer_id", customerId)
      .withColumn("full_name", fullName)
      .groupBy(col("customer_id"), col("full_name"), col("sales_month"))
      .agg(moneySum(amount).as("total_sales"))

  /** Sales mart: per (store, person, month) totals, rank of persons within
    * (store, month) by total desc — `rank()`, not row_number, to preserve
    * tie semantics (multiple rank-1 winners all get incentive) — and a
    * conditional 1% incentive, rounded to cents
    * (sales_data_mart_sql_transform.py:8-26).
    *
    * The per-group total uses groupBy (see customerMartGrouped); the rank
    * window then runs over the already-collapsed mart rows — tiny relative
    * to the fact table, so the second shuffle is negligible at scale.
    */
  def salesMart(sales: DataFrame, storeId: Column, personId: Column,
                fullName: Column, dateCol: Column, amount: Column): DataFrame = {
    val totals = sales
      .withColumn("sales_month", monthKey(dateCol))
      .withColumn("store_id", storeId)
      .withColumn("sales_person_id", personId)
      .withColumn("full_name", fullName)
      .groupBy(col("store_id"), col("sales_person_id"), col("full_name"), col("sales_month"))
      .agg(sum(amount.cast("decimal(18,2)")).as("total_dec"))
    val rankW = Window.partitionBy(col("store_id"), col("sales_month"))
      .orderBy(col("total_dec").desc)
    totals
      .withColumn("rnk", rank().over(rankW))
      .withColumn("incentive",
        when(col("rnk") === 1, round(col("total_dec") * lit(BigDecimal("0.01")), 2))
          .otherwise(lit(0)).cast("double"))
      .select(col("store_id"), col("sales_person_id"), col("full_name"),
        col("sales_month"), col("total_dec").cast("double").as("total_sales"),
        col("incentive"))
  }
}
