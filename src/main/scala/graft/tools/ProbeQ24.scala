package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the q24 sketch-verification row (dev utility):
  * times each aggregate family in isolation to attribute the row's cost.
  * Every stage is forced through `queryExecution.toRdd.count()` — a plain
  * `.count()` on an Aggregate lets Catalyst prune the aggregate
  * expressions themselves, which silently times an empty shell. */
object ProbeQ24 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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
    def full(df: DataFrame): Long = df.queryExecution.toRdd.count()

    t("warmup")(li.count())
    // claim rows derived from the SAME data (one percentile pass,
    // collected): the profiled join keeps every row and the conditional
    // counts see production selectivity — hard-coded flags/thresholds
    // would drop rows on a domain mismatch and under-measure the stage
    val pcts = li.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.99)), lit(1000)).as("ps"))
      .select(col("l_returnflag"),
        element_at(col("ps"), 1).as("p50"), element_at(col("ps"), 2).as("p99"))
    val claims = spark.createDataFrame(
      java.util.Arrays.asList(pcts.collect(): _*), pcts.schema)
    (1 to 2).foreach { _ =>
      t("exact_distincts")(full(li.groupBy(col("l_returnflag"))
        .agg(count_distinct(col("l_partkey")),
          count_distinct(col("l_orderkey")))))
      t("approx_distincts")(full(li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02),
          approx_count_distinct(col("l_orderkey"), 0.02))))
      t("pct_sketch")(full(li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.99)), lit(1000)))))
      t("all4_one_agg")(full(li.groupBy(col("l_returnflag"))
        .agg(count_distinct(col("l_partkey")),
          approx_count_distinct(col("l_partkey"), 0.02),
          count_distinct(col("l_orderkey")),
          approx_count_distinct(col("l_orderkey"), 0.02))))
      t("rank_pass")(full(li
        .join(broadcast(claims), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          count(when(col("l_extendedprice") < col("p50"), 1)).as("lt50"),
          count(when(col("l_extendedprice") <= col("p50"), 1)).as("le50"),
          count(when(col("l_extendedprice") <= col("p99"), 1)).as("le99"))))
      // the REJECTED single-aggregate fold (kept for comparison): its
      // 3-projection Expand + wide-key partial agg measured 1.7x slower
      // than running exact and approx/rank as separate narrow passes —
      // which is why production q24 splits them
      t("combined_pass")(full(li
        .join(broadcast(claims), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(count_distinct(col("l_partkey")),
          approx_count_distinct(col("l_partkey"), 0.02),
          count_distinct(col("l_orderkey")),
          approx_count_distinct(col("l_orderkey"), 0.02),
          count(lit(1)).as("n"),
          count(when(col("l_extendedprice") < col("p50"), 1)).as("lt50"),
          count(when(col("l_extendedprice") <= col("p50"), 1)).as("le50"),
          count(when(col("l_extendedprice") <= col("p99"), 1)).as("le99"))))
    }
    t("full_q24_catalog")(graft.queries.ExtendedQueries
      .q24Sketches(spark, dir).queryExecution.toRdd.count())
    t("full_q24_again")(graft.queries.ExtendedQueries
      .q24Sketches(spark, dir).queryExecution.toRdd.count())
    spark.stop()
  }
}
