package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single catalog query in isolation (dev utility):
  * runMain graft.tools.ProfileQuery <sfDir> <name> [reps] */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // table-backed rows (p54/p56-p59) must not litter the repo root
      // with a ./spark-warehouse; same pid-token scratch as Bench
      .config("spark.sql.warehouse.dir", graft.io.TempPaths.newWarehouseDir())
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      // match Bench: fresh scratch per rep, so stateful queries run COLD
      // instead of resuming their checkpoint as an exactly-once no-op
      graft.io.TempPaths.bumpEpoch()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).queryExecution.toRdd.count()
      println(f"PROFILE $name rep$i ${(System.nanoTime() - t0) / 1e9}%8.3f s rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
