package graft.io

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import java.sql.Timestamp

/** File-ingest audit ledger — the reference's MySQL staging-table protocol
  * (product_staging_table; main.py:151-177, 318-334) as a typed Dataset
  * over a parquet directory. Status lifecycle: "A" (active/in-flight) ->
  * "I" (inactive/done); files still "A" at startup mean the last run
  * failed (main.py:40-47).
  *
  * The streaming path (EventsStream.runAvailableNow + checkpointing)
  * subsumes this mechanism with exactly-once file tracking; the ledger is
  * kept for operational parity and auditability.
  */
object Ledger {

  final val Active = "A"
  final val Done = "I"

  case class FileAudit(file_name: String, file_location: String,
                       created_date: Timestamp, status: String)

  /** Consolidate a mid-swap crash state: if the ledger is missing but the
    * moved-aside `_old` copy exists (a crash inside markDone's swap, after
    * the old ledger moved aside and before the new one was promoted),
    * promote `_old` back. Every entry point runs this first, so the
    * recovery state never lingers: read() sees the preserved rows,
    * recordActive appends to them instead of shadowing them, and a
    * subsequent markDone swaps against a real ledger instead of deleting
    * the only durable copy. */
  private def restoreIfNeeded(path: String): Unit = {
    val main = new java.io.File(path)
    val old = new java.io.File(path + "_old")
    if (!main.exists() && old.exists())
      java.nio.file.Files.move(old.toPath, main.toPath)
  }

  def read(spark: SparkSession, path: String): Dataset[FileAudit] = {
    import spark.implicits._
    restoreIfNeeded(path)
    if (new java.io.File(path).exists()) spark.read.parquet(path).as[FileAudit]
    else spark.emptyDataset[FileAudit]
  }

  /** Files whose previous run never completed (lingering "A" rows that
    * still exist in the incoming set) — the recovery check. */
  def failedInFlight(spark: SparkSession, path: String,
                     incoming: Seq[String]): Seq[String] = {
    import spark.implicits._
    val names = incoming.map(f => new java.io.File(f).getName).toSet
    read(spark, path).filter(_.status == Active).collect()
      .map(_.file_name).filter(names.contains).toSeq
  }

  /** Append "A" rows for files entering processing (main.py:162-174). */
  def recordActive(spark: SparkSession, path: String, files: Seq[String],
                   now: Timestamp = new Timestamp(System.currentTimeMillis())): Unit = {
    import spark.implicits._
    restoreIfNeeded(path)
    files.map(f => FileAudit(new java.io.File(f).getName, f, now, Active))
      .toDS().write.mode(SaveMode.Append).parquet(path)
  }

  /** Rewrite the ledger flipping the given files to "I" (main.py:323-334).
    * Parquet has no in-place UPDATE; the ledger is tiny (one row per file),
    * so read-modify-overwrite is the honest equivalent. */
  def markDone(spark: SparkSession, path: String, files: Seq[String]): Unit = {
    import spark.implicits._
    restoreIfNeeded(path) // read() below would also restore; be explicit
    val names = files.map(f => new java.io.File(f).getName).toSet
    val updated = read(spark, path).collect().map { a =>
      if (names.contains(a.file_name) && a.status == Active) a.copy(status = Done) else a
    }.toSeq
    // crash-safe swap: write the new ledger, move the old one ASIDE (so a
    // failure between steps leaves a recoverable copy, never a deleted
    // ledger), promote, then drop the old copy. Files.move throws on
    // failure instead of returning an ignorable boolean.
    val tmp = java.nio.file.Paths.get(path + "_tmp")
    val old = java.nio.file.Paths.get(path + "_old")
    updated.toDS().write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
    if (new java.io.File(path).exists())
      java.nio.file.Files.move(java.nio.file.Paths.get(path), old)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path))
    org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
  }
}
