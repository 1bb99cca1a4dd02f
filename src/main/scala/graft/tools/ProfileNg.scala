package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
object ProfileNg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $n%-30s ${(System.nanoTime()-t0)/1e9}%7.3f s rows=$r")
    }
    time("warm")(docs.count())
    val one = docs.select(size(TextFunctions.char_ngrams(col("text"),3)).as("a"))
    time("one ngrams toRdd (jit)")(one.queryExecution.toRdd.count())
    time("one ngrams toRdd")(one.queryExecution.toRdd.count())
    val two = docs.select(size(TextFunctions.char_ngrams(col("text"),3)).as("a"),
      size(TextFunctions.char_ngrams(upper(col("text")),3)).as("b"))
    time("two ngrams toRdd")(two.queryExecution.toRdd.count())
    time("two ngrams toRdd rep2")(two.queryExecution.toRdd.count())
    spark.stop()
  }
}
