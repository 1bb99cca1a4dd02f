package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the window-hash df device vs the skew-safe aggregate form
  * under a PLANTED heavy hitter (dev tool — the measurement behind the
  * regime boundary documented on Dedup.substringRemove): a fixed
  * 9-token boilerplate span is prepended to `hotFrac` of the corpus,
  * so one window hash carries O(corpus) occurrences — the distribution
  * a license-header-laden crawl produces. Reports wall time and the
  * max/median task-duration ratio (a straggler detector: the window
  * form funnels every hot-hash row through ONE task, the aggregate
  * form partial-aggregates them away) for both forms.
  *
  * runMain graft.tools.SkewProbe <docsDir> [hotFrac=0.5] [reps=3]
  */
object SkewProbe {

  private class TaskTimes extends SparkListener {
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null && t.taskInfo.successful)
        durations.add(t.taskInfo.duration)
    def maxOverMedian(): Double = {
      val ds = scala.jdk.CollectionConverters
        .CollectionHasAsScala(durations).asScala.toSeq.sorted
      if (ds.size < 4) 1.0
      else ds.last.toDouble / math.max(1.0, ds(ds.size / 2).toDouble)
    }
    def reset(): Unit = durations.clear()
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val hotFrac = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new TaskTimes
    spark.sparkContext.addSparkListener(listener)
    val hot = "copyright two thousand all rights reserved by example corp"
    val mod = math.max(1, math.round(1.0 / hotFrac).toInt)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % mod === 0, concat(lit(hot + " "), col("text")))
          .otherwise(col("text")).as("text"))
      .localCheckpoint()
    val n = docs.count()
    println(s"SKEWPROBE corpus=$n docs, hot span in ~${100 / mod}% of docs")

    Seq(false, true).foreach { safe =>
      val times = (1 to reps).map { i =>
        listener.reset()
        val t0 = System.nanoTime()
        val rows = graft.ops.Dedup.substringRemove(docs, k = 8,
          skewSafe = safe).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // let the listener bus drain task-end events
        println(f"SKEWPROBE skewSafe=$safe rep$i $dt%7.2f s rows=$rows " +
          f"max_task/median_task=${listener.maxOverMedian()}%5.1f")
        dt
      }
      println(f"SKEWPROBE skewSafe=$safe median=${times.sorted.apply(times.size / 2)}%7.2f s")
    }
    spark.stop()
  }
}
