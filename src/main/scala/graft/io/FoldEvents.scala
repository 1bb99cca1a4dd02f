package graft.io

/** Maintenance-rewrite event counter + log line (VERDICT r19 item 1).
  *
  * The r19 q81 arbitration stalled on not knowing whether a slow rep
  * had run MORE folds than the protocol floor expects (the fixture
  * fires exactly one per rep) or just hit ambient contention. Every
  * fold rewrite now records itself here: a one-line stderr note (cheap
  * — folds are cadence events, not per-row work) and a JVM-global
  * counter profiling harnesses read per rep
  * (`ProfileArb` prints the delta next to each rep's time).
  */
object FoldEvents {

  private val counter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Total fold rewrites since JVM start (base merges + run folds). */
  def count: Long = counter.get()

  def record(table: String, kind: String, partitions: Int): Unit = {
    counter.incrementAndGet()
    System.err.println(
      s"[graft.fold] table=$table kind=$kind partitions=$partitions")
  }
}
