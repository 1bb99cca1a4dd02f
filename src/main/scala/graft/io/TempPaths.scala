package graft.io

/** Per-application scratch directories for queries that demonstrate a
  * write-then-read pattern (partitioned mart round trip, compaction).
  * Paths are unique per (application, input) so concurrent drivers —
  * bench and correctness, or two scale factors — never read each
  * other's output, and a JVM shutdown hook removes whatever was
  * registered (deleting earlier would break the lazily-read DataFrames
  * the queries return). */
object TempPaths {

  /** `<tmpdir>/<prefix>_<appId>_<hash(discriminator)>`. */
  def scratchDir(spark: org.apache.spark.sql.SparkSession, prefix: String,
                 discriminator: String): String = {
    val tag = java.lang.Integer.toHexString(discriminator.hashCode)
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      s"${prefix}_${spark.sparkContext.applicationId}_$tag").getAbsolutePath
    cleanupOnExit(out)
    out
  }

  private val exitCleanupPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val exitHookInstalled: Unit = {
    sys.addShutdownHook {
      exitCleanupPaths.forEach { p =>
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
        catch { case _: java.io.IOException => () }
      }
    }; ()
  }

  def cleanupOnExit(path: String): Unit = {
    exitHookInstalled
    exitCleanupPaths.add(path); ()
  }
}
