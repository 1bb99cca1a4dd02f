package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructType}

/** SQL surface for the retraction lifecycle (VERDICT r17 item 7): the
  * right-to-be-forgotten path callable without Scala, via
  * `spark.sql(...)` on a session built with [[graft.GraftExtensions]]
  * (which injects this parser in front of the session parser).
  *
  * Two statements, covering both halves of the protocol
  * ([[graft.io.Tombstones]] for posting-list families, negated
  * partials for the additive-df families):
  *
  * {{{
  * RETRACT FROM <family> INDEX <t1>[, <t2>] [TOMBSTONES <tt>]
  *   BATCH <n> [K <k>] AS <select returning the retired rows>
  *
  * PURGE RETRACTIONS FROM <family> INDEX <t1>[, <t2>] TOMBSTONES <tt>
  * }}}
  *
  * Families: `minhash` (INDEX bands, sigs — TOMBSTONES required),
  * `vector` (INDEX bands, vecs — TOMBSTONES required), `ivf` (INDEX
  * assign — TOMBSTONES required) retire by id through the tombstone
  * protocol, so the AS query returns the retired id column
  * (doc_id / corpus_id / vec_id). `shingle_df`, `line_df`,
  * `window_df` (optional K, default 8), `token_count`, `bm25_df`
  * retract by negated partial, so the AS query returns the retired
  * DOCUMENTS (doc_id, text) — the negation must re-derive exactly what
  * the append derived. Every guard of the Scala surface fires
  * unchanged (orphan, double-retract, negative-fold, kind stamps,
  * purge watermark): this is a parser front-end, not a second
  * implementation.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseRetraction(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  /** family -> (expected INDEX table count, tombstone id column or None
    * for the negated-partial families) */
  private val families: Map[String, (Int, Option[String])] = Map(
    "minhash" -> (2, Some("doc_id")),
    "vector" -> (2, Some("corpus_id")),
    "ivf" -> (1, Some("vec_id")),
    "shingle_df" -> (1, None),
    "line_df" -> (1, None),
    "window_df" -> (1, None),
    "token_count" -> (1, None),
    "bm25_df" -> (1, None))

  private val RetractRe =
    ("""(?is)\s*RETRACT\s+FROM\s+(\w+)\s+INDEX\s+([\w.]+(?:\s*,\s*[\w.]+)*)""" +
      """(?:\s+TOMBSTONES\s+([\w.]+))?\s+BATCH\s+(\d+)(?:\s+K\s+(\d+))?""" +
      """\s+AS\s+(.+?)\s*;?\s*""").r
  private val PurgeRe =
    ("""(?is)\s*PURGE\s+RETRACTIONS\s+FROM\s+(\w+)\s+INDEX\s+""" +
      """([\w.]+(?:\s*,\s*[\w.]+)*)\s+TOMBSTONES\s+([\w.]+)\s*;?\s*""").r

  private[graft] def parseRetraction(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case RetractRe(family, tables, tombs, batch, k, source) =>
        Some(RetractIndexCommand(validate(family, tables, Option(tombs)),
          splitTables(tables), Option(tombs), batch.toLong,
          Option(k).map(_.toInt), source))
      case PurgeRe(family, tables, tombs) =>
        val f = validate(family, tables, Some(tombs))
        require(families(f)._2.isDefined,
          s"PURGE RETRACTIONS applies to the tombstone families " +
            s"(${families.filter(_._2._2.isDefined).keys.toSeq.sorted.mkString(", ")}); " +
            s"'$f' retracts by negated partial and has nothing to purge")
        Some(PurgeRetractionsCommand(f, splitTables(tables), tombs))
      case _ => None
    }

  private def splitTables(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def validate(familyRaw: String, tables: String,
                       tombs: Option[String]): String = {
    val family = familyRaw.toLowerCase(java.util.Locale.ROOT)
    require(families.contains(family),
      s"unknown index family '$family' — expected one of " +
        families.keys.toSeq.sorted.mkString(", "))
    val (nTables, idCol) = families(family)
    val given = splitTables(tables).size
    require(given == nTables,
      s"family '$family' takes $nTables INDEX table(s), got $given")
    if (idCol.isDefined)
      require(tombs.isDefined,
        s"family '$family' retires ids through the tombstone protocol — " +
          "a TOMBSTONES table is required")
    else
      require(tombs.isEmpty,
        s"family '$family' retracts by negated partial — it has no " +
          "TOMBSTONES table (the retraction lands as a negative batch)")
    family
  }
}

/** `RETRACT FROM ...` — lands one retraction batch through the exact
  * Scala path of the named family. The AS query runs in the command's
  * session; `n_source_rows` reports the rows it returned (the family
  * dedups ids internally where applicable). */
case class RetractIndexCommand(family: String, tables: Seq[String],
                               tombstones: Option[String], batchId: Long,
                               k: Option[Int], sourceSql: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("family", StringType, nullable = false)(),
    AttributeReference("batch_id", LongType, nullable = false)(),
    AttributeReference("n_source_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val removed = spark.sql(sourceSql)
    val n = removed.count()
    family match {
      case "minhash" =>
        graft.ops.Dedup.retractFromCorpusIndex(spark, removed,
          tables(0), tables(1), tombstones.get, batchId)
      case "vector" =>
        graft.ops.Similarity.retractFromVectorIndex(spark, removed,
          tables(0), tables(1), tombstones.get, batchId)
      case "ivf" =>
        graft.ops.Similarity.retractFromIvfIndex(spark, removed,
          tables(0), tombstones.get, batchId)
      case "shingle_df" =>
        graft.ops.Dedup.retractShingleDfPartial(spark, removed, tables(0),
          batchId)
      case "line_df" =>
        graft.ops.TextAnalysis.retractLineDfPartial(spark, removed,
          tables(0), batchId)
      case "window_df" =>
        graft.ops.Dedup.retractWindowDfPartial(spark, removed, tables(0),
          batchId, k = k.getOrElse(8))
      case "token_count" =>
        graft.ops.TextAnalysis.retractTokenCountPartial(spark, removed,
          tables(0), batchId)
      case "bm25_df" =>
        graft.ops.TextAnalysis.retractBm25DfPartial(spark, removed,
          tables(0), batchId)
    }
    Seq(Row(family, batchId, n))
  }
}

/** `PURGE RETRACTIONS FROM ...` — folds every pending tombstone batch
  * into the family tables through the crash-safe swap and drops the
  * gate (the [[graft.io.Tombstones.purge]] path, watermark included).
  * `purged` is false when there was nothing pending. */
case class PurgeRetractionsCommand(family: String, tables: Seq[String],
                                   tombstonesTable: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("family", StringType, nullable = false)(),
    AttributeReference("purged", BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val purged = family match {
      case "minhash" =>
        graft.ops.Dedup.purgeCorpusIndexRetractions(spark, tables(0),
          tables(1), tombstonesTable)
      case "vector" =>
        graft.ops.Similarity.purgeVectorIndexRetractions(spark, tables(0),
          tables(1), tombstonesTable)
      case "ivf" =>
        graft.ops.Similarity.purgeIvfIndexRetractions(spark, tables(0),
          tombstonesTable)
    }
    Seq(Row(family, purged))
  }
}
