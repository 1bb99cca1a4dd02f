package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}

/** Tombstone-based RETRACTION for posting-list index families (minhash
  * bands/sigs, vector bands/payloads) — the right-to-be-forgotten path
  * the additive-df families solve with negated partials
  * (Dedup.retractShingleDfPartial) but posting lists cannot: a posting
  * row is a fact about one document, not a count, so deletion must
  * REMOVE rows, and rewriting a 100 TB index per deletion request is
  * not an option.
  *
  * The protocol, mirroring the append side's economics:
  *
  *  1. [[land]] — record the retired ids as their own batch_id
  *     partition of a tiny tombstone table: O(|removed|) write, same
  *     idempotent-replay discipline as every append partial (a torn
  *     retraction batch re-lands over itself).
  *  2. probe-side filtering — probes broadcast-anti-join the tombstone
  *     ids against the index scans (a map-side gate on the corpus
  *     side, no added exchange), so a retired document STOPS MATCHING
  *     the instant the tombstone lands, long before any rewrite.
  *  3. [[purge]] — at maintenance cadence, fold the tombstones into
  *     the index for real via the crash-safe layout-preserving
  *     [[Bucketing.purgeBucketed]] swap, then drop the tombstone
  *     table: the index is again byte-equivalent to a rebuild without
  *     the retired documents, and the probe-side filter becomes a
  *     no-op it no longer needs.
  *
  * Guards (the negative-df analogue for posting lists): retracting a
  * document the index never contained fails loudly (orphan guard), as
  * does retracting the same document twice across batches — both are
  * history corruption a silent accept would bake into every future
  * probe. A REPLAY of the same batch (same batch_id) is not a double
  * retraction and stays idempotent.
  */
object Tombstones {

  /** Land `ids` (single id column named `idCol`) as retraction batch
    * `batchId` of `tombstonesTable`. `sigsTable` is the family table
    * that carries one row per indexed document under the same id
    * column — the orphan guard checks membership against it. */
  def land(spark: SparkSession, ids: DataFrame, idCol: String,
           tombstonesTable: String, kind: String, batchId: Long,
           sigsTable: String): Unit = {
    val distinctIds = ids.select(col(idCol)).distinct().localCheckpoint()
    // orphan guard: a retraction can only retire documents the index
    // actually contains — a typo'd id list silently "succeeding" would
    // leave the operator believing data was forgotten when nothing was
    val orphans = distinctIds
      .join(spark.table(sigsTable).select(col(idCol)), Seq(idCol), "left_anti")
      .count()
    require(orphans == 0L,
      s"retraction names $orphans document(s) absent from $sigsTable — " +
        "retracting a never-indexed document is history corruption; " +
        "check the id list")
    if (spark.catalog.tableExists(tombstonesTable)) {
      Bucketing.requireKind(spark, tombstonesTable, kind)
      // double-retraction guard — but a REPLAY of this same batch_id
      // (the at-least-once window) must pass and idempotently overwrite
      // its own partition
      val dup = distinctIds.join(
          spark.table(tombstonesTable).filter(col("batch_id") =!= batchId)
            .select(col(idCol)),
          Seq(idCol), "left_semi")
        .count()
      require(dup == 0L,
        s"$dup document(s) already retracted in an earlier batch of " +
          s"$tombstonesTable — a double retraction is history corruption")
      Bucketing.overwritePartitions(
        distinctIds.withColumn("batch_id", lit(batchId)), tombstonesTable)
    } else {
      Bucketing.dropTable(spark, tombstonesTable)
      distinctIds.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id").format("parquet")
        .saveAsTable(tombstonesTable)
      Bucketing.stampKind(spark, tombstonesTable, kind)
    }
  }

  /** Probe-side gate: drop tombstoned ids from an index scan. The
    * tombstone set broadcasts (it is retraction-sized), so the gate is
    * map-side on the index scan — no exchange is added and the scan's
    * bucketed output partitioning survives for the probe join. No-op
    * when no tombstone table exists (nothing retracted yet, or already
    * purged). */
  def filterRetracted(spark: SparkSession, indexRows: DataFrame,
                      idCol: String, tombstonesTable: Option[String],
                      kind: String): DataFrame =
    tombstonesTable.filter(spark.catalog.tableExists) match {
      case None => indexRows
      case Some(tt) =>
        Bucketing.requireKind(spark, tt, kind)
        indexRows.join(
          broadcast(spark.table(tt).select(col(idCol))), Seq(idCol),
          "left_anti")
    }

  /** Fold the tombstones into the index for real: purge every family
    * table (crash-safe layout-preserving swap), then drop the
    * tombstone table. Ordering makes every crash window safe: until
    * the final drop, probes still filter by the tombstones (filtering
    * an already-purged id is a no-op); after it, the index itself is
    * the rebuild-without. Returns true when a purge ran. */
  def purge(spark: SparkSession, tombstonesTable: String, idCol: String,
            kind: String, tables: Seq[String]): Boolean = {
    if (!spark.catalog.tableExists(tombstonesTable)) return false
    Bucketing.requireKind(spark, tombstonesTable, kind)
    val ids = spark.table(tombstonesTable).select(col(idCol)).distinct()
      .localCheckpoint()
    tables.foreach(t => Bucketing.purgeBucketed(spark, t, ids, idCol))
    Bucketing.dropTable(spark, tombstonesTable)
    true
  }
}
