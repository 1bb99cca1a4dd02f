package graft

import graft.marts.Marts
import graft.queries.CoreQueries
import org.apache.spark.sql.functions._

/** Mart semantics: the reference's window+distinct idiom must equal the
  * grouped form we ship (SURVEY.md §2.5 A3 — equality holds because every
  * selected column is functionally dependent on the grouping keys). */
class MartsSpec extends SparkSpec {
  import spark.implicits._

  test("window+distinct ≡ groupBy on the orders fact") {
    val o = Tables.orders(spark, sfDir)
    val windowed = CoreQueries.q05WindowDistinct(spark, sfDir)
    val grouped = o
      .withColumn("sales_month", Marts.monthKey(col("o_orderdate")))
      .groupBy(col("o_custkey").as("customer_id"), col("sales_month"))
      .agg(Marts.moneySum(col("o_totalprice")).as("total_sales"))
    assert(windowed.exceptAll(grouped).isEmpty && grouped.exceptAll(windowed).isEmpty)
  }

  test("window+distinct ≡ groupBy on synthetic data with ties and negatives") {
    val df = Seq(
      (1, "2024-01-03", 10.50), (1, "2024-01-09", -2.25), (1, "2024-02-01", 3.0),
      (2, "2024-01-03", 10.50), (2, "2024-01-03", 10.50), (3, "2024-03-31", 0.0))
      .toDF("cust", "d", "amt")
    val windowed = df
      .withColumn("sales_month", Marts.monthKey(col("d")))
      .withColumn("total_sales", sum(col("amt").cast("decimal(18,2)"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("cust"), col("sales_month"))).cast("double"))
      .select(col("cust"), col("sales_month"), col("total_sales")).distinct()
    val grouped = df
      .withColumn("sales_month", Marts.monthKey(col("d")))
      .groupBy(col("cust"), col("sales_month"))
      .agg(Marts.moneySum(col("amt")).as("total_sales"))
    assert(windowed.exceptAll(grouped).isEmpty && grouped.exceptAll(windowed).isEmpty)
  }

  test("sales mart rank ties: equal totals share rank 1 and both get incentive") {
    val df = Seq(
      (1, 11, "a", "2024-01-05", 100.0), (1, 12, "b", "2024-01-06", 100.0),
      (1, 13, "c", "2024-01-07", 50.0))
      .toDF("store", "person", "name", "d", "amt")
    val mart = Marts.salesMart(df, col("store"), col("person"), col("name"),
      col("d"), col("amt")).collect().map(r =>
      (r.getAs[Int]("sales_person_id"), r.getAs[Double]("incentive"))).toMap
    assert(mart(11) === 1.0 && mart(12) === 1.0 && mart(13) === 0.0)
  }

  test("incentive is rounded to cents, half away from zero") {
    val df = Seq((1, 11, "a", "2024-01-05", 123.45)).toDF("store", "person", "name", "d", "amt")
    val inc = Marts.salesMart(df, col("store"), col("person"), col("name"),
      col("d"), col("amt")).select("incentive").as[Double].head()
    // 123.45 * 0.01 = 1.2345 -> 1.23 exactly (decimal arithmetic)
    assert(inc === 1.23)
  }
}
