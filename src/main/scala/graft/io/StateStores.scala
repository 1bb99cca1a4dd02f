package graft.io

/** Harness-side access to Spark's JVM-global state-store provider map.
  *
  * `StateStore.unloadAll()` is `private[sql]`, so the bench/profiling
  * mains reach it reflectively: a TERMINATED streaming query's RocksDB
  * providers stay registered in the global loaded-providers map and the
  * maintenance thread keeps paying snapshot/cleanup work for them on
  * every tick — a ~2-3 s/rep tax on every later stateful row
  * (PROFILE_r19's root cause of the r18 streaming-row drift). Unloading
  * between queries is safe: the next `get()` restarts maintenance.
  *
  * The reflection is wrapped in Try (ADVICE r19): a Spark upgrade that
  * renames or removes the method must degrade the harness to the
  * pre-r19 (slightly noisier) measurement with a logged warning, not
  * turn every bench run into a hard NoSuchMethodException failure. The
  * warning prints once per JVM — per-rep repetition would bury the
  * bench's own output.
  */
object StateStores {

  @volatile private var warned = false

  /** Unload every registered state-store provider; on reflection
    * failure, warn once and continue. Returns true when the unload
    * actually ran. */
  def unloadAllQuietly(): Boolean =
    scala.util.Try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      cls.getMethod("unloadAll").invoke(cls.getField("MODULE$").get(null))
    } match {
      case scala.util.Success(_) => true
      case scala.util.Failure(e) =>
        if (!warned) {
          warned = true
          System.err.println(
            "[graft] StateStore.unloadAll unavailable " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}) — " +
              "stateful timings may read 2-3 s/rep high (dead providers " +
              "tax the maintenance thread); measurements continue")
        }
        false
    }
}
