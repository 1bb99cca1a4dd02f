package graft.tools
object ShowCounts {
  def main(args: Array[String]): Unit = {
    println("queries=" + graft.SparkEntry.queries.size)
    println("oracles=" + graft.SparkEntry.oracleSql.size)
  }
}
