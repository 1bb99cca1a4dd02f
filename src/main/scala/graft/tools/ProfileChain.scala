package graft.tools

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the dedup-groups chain query (dev utility). */
object ProfileChain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    time("warmup")(docs.count())
    val edges = Dedup.ngramJaccardConsecutive(docs, n = 3)
      .filter(col("jaccard") >= 0.7)
    time("edges count")(println("  edges=" + edges.count()))
    time("edges count again")(println("  edges=" + edges.count()))
    val grouped = time("dedupGroups build (eager)")(Dedup.dedupGroups(docs, edges))
    time("result materialize")(grouped.queryExecution.toRdd.count())
    spark.catalog.clearCache()
    time("full p23 again")(
      graft.queries.RecallQueries.dedupGroupsChain(spark, dir)
        .queryExecution.toRdd.count())
    spark.stop()
  }
}
