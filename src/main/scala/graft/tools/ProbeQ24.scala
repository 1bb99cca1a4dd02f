package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the q24 sketch-verification row (dev utility):
  * times each aggregate family in isolation to attribute the row's cost. */
object ProbeQ24 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_partkey"), col("l_orderkey"),
        col("l_extendedprice"))

    def t(tag: String)(f: => Long): Unit = {
      val s = System.nanoTime()
      val n = f
      println(f"PROBE $tag%-18s ${(System.nanoTime() - s) / 1e9}%7.2f s rows=$n")
    }

    t("warmup")(li.count())
    (1 to 2).foreach { _ =>
      t("exact_distincts")(li.groupBy(col("l_returnflag"))
        .agg(count_distinct(col("l_partkey")),
          count_distinct(col("l_orderkey"))).count())
      t("approx_distincts")(li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02),
          approx_count_distinct(col("l_orderkey"), 0.02)).count())
      t("pct_sketch")(li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.99)), lit(1000))).count())
      t("all4_one_agg")(li.groupBy(col("l_returnflag"))
        .agg(count_distinct(col("l_partkey")),
          approx_count_distinct(col("l_partkey"), 0.02),
          count_distinct(col("l_orderkey")),
          approx_count_distinct(col("l_orderkey"), 0.02)).count())
    }
    t("full_q24_catalog")(graft.queries.ExtendedQueries
      .q24Sketches(spark, dir).queryExecution.toRdd.count())
    t("full_q24_again")(graft.queries.ExtendedQueries
      .q24Sketches(spark, dir).queryExecution.toRdd.count())
    println(graft.queries.ExtendedQueries.q24Sketches(spark, dir)
      .queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
