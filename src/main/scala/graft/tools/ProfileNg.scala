package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileNg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val r = o.groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.9))").as("q"))
      .orderBy("o_orderpriority")
    r.collect().foreach(row => println("SPARK " + row.getString(0) + " " +
      row.getSeq[Double](1).map(d => f"$d%.17g").mkString(",")))
    spark.stop()
  }
}
