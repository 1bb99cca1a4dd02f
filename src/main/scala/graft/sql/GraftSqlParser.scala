package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructType}

/** SQL surface for the persisted-index LIFECYCLE (VERDICT r17 item 7
  * brought the retraction half; r18 item 4 the rest): every stage an
  * operator needs — build, maintain, compact/fold, probe, retract,
  * purge — callable without Scala, via `spark.sql(...)` on a session
  * built with [[graft.GraftExtensions]] (which injects this parser in
  * front of the session parser).
  *
  * {{{
  * CREATE <family> INDEX <t1>[, <t2>] [K <k>] [BUCKETS <b>] AS <select>
  * APPEND TO <family> INDEX <t1>[, <t2>] BATCH <n> [K <k>] [BUCKETS <b>]
  *   AS <select>
  * COMPACT INDEX <t>
  * PROBE <family> INDEX <t1>[, <t2>] [K <k>] [TOMBSTONES <tt>]
  *   [QUERIES <query_table>] INTO <out_table> AS <select>
  * RETRACT FROM <family> INDEX <t1>[, <t2>] [TOMBSTONES <tt>]
  *   BATCH <n> [K <k>] AS <select returning the retired rows>
  * PURGE RETRACTIONS FROM <family> INDEX <t1>[, <t2>] TOMBSTONES <tt>
  * }}}
  *
  * Families: `minhash` (INDEX bands, sigs — TOMBSTONES required on
  * RETRACT), `vector` (INDEX bands, vecs), `ivf` (INDEX assign) retire
  * by id through the tombstone protocol, so the RETRACT source returns
  * the retired id column (doc_id / corpus_id / vec_id). `shingle_df`,
  * `line_df`, `window_df` (optional K, default 8), `token_count`,
  * `bm25_df` retract by negated partial, so the source returns the
  * retired DOCUMENTS (doc_id, text). CREATE/APPEND route through the
  * same per-batch partial path the streamed maintenance uses (CREATE =
  * batch 0 of a table that must not exist yet); they cover minhash and
  * the five additive-df families — `vector`/`ivf` builds pin geometry
  * (bits per table, centroid artifacts) that a two-keyword grammar
  * cannot carry honestly, so they stay Scala
  * (Similarity.buildVectorIndex / buildIvfIndex) with a designed
  * error here. COMPACT INDEX applies the table's own maintenance
  * policy: the zero-sum-dropping FOLD for additive-df tables, the
  * identity compaction otherwise. PROBE runs the family's incremental
  * probe over the source rows and writes the result INTO a table —
  * results stay distributed; the command returns only the row count.
  * `minhash` probes take an optional `TOMBSTONES <tt>` naming a
  * pending (unpurged) gate — retired docs stop matching before any
  * physical purge; `bm25_df` probes name their fixed query set with
  * `QUERIES <table-or-view>` (resolved in the command's session).
  *
  * Table names are UNQUALIFIED (session default database) by design:
  * the index maintenance machinery addresses warehouse directories by
  * table name, and a half-supported `db.t` would fail deep inside a
  * rewrite instead of at the parser (ADVICE r18) — a dotted name is
  * rejected here with the grammar.
  *
  * Every guard of the Scala surface fires unchanged (orphan,
  * double-retract, negative-fold, kind stamps, purge + fold
  * watermarks): this is a parser front-end, not a second
  * implementation. A retraction/append swallowed by a replay
  * watermark reports `landed = false` in the command output (ADVICE
  * r18) — the SQL operator sees the no-op.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseGraftStatement(sqlText)
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

  /** Families whose build/append is a per-batch partial the grammar can
    * route with at most a K knob (the vector/ivf geometry params stay
    * Scala-only by design — see the class doc). */
  private val buildable: Set[String] =
    Set("minhash", "shingle_df", "line_df", "window_df", "token_count",
      "bm25_df")

  /** Families whose incremental probe is SQL-surfaced — all but
    * vector/ivf, whose probes pin banding/centroid geometry a grammar
    * cannot carry. minhash probes at the default build geometry (the
    * same defaults CREATE/APPEND use, so a SQL-built index probes
    * consistently) and takes the optional live TOMBSTONES gate;
    * bm25_df's second input (the fixed query set) arrives as
    * `QUERIES <table-or-view>` resolved in the command's session. */
  private val probeable: Set[String] =
    Set("minhash", "shingle_df", "line_df", "window_df", "token_count",
      "bm25_df")

  // unqualified (\w+) table names only — see the class doc
  private val Tbls = """\w+(?:\s*,\s*\w+)*"""
  private val RetractRe =
    (s"""(?is)\\s*RETRACT\\s+FROM\\s+(\\w+)\\s+INDEX\\s+($Tbls)""" +
      """(?:\s+TOMBSTONES\s+(\w+))?\s+BATCH\s+(\d+)(?:\s+K\s+(\d+))?""" +
      """\s+AS\s+(.+?)\s*;?\s*""").r
  private val PurgeRe =
    (s"""(?is)\\s*PURGE\\s+RETRACTIONS\\s+FROM\\s+(\\w+)\\s+INDEX\\s+""" +
      s"""($Tbls)\\s+TOMBSTONES\\s+(\\w+)\\s*;?\\s*""").r
  private val CreateRe =
    (s"""(?is)\\s*CREATE\\s+(\\w+)\\s+INDEX\\s+($Tbls)""" +
      """(?:\s+K\s+(\d+))?(?:\s+BUCKETS\s+(\d+))?\s+AS\s+(.+?)\s*;?\s*""").r
  private val AppendRe =
    (s"""(?is)\\s*APPEND\\s+TO\\s+(\\w+)\\s+INDEX\\s+($Tbls)""" +
      """\s+BATCH\s+(\d+)(?:\s+K\s+(\d+))?(?:\s+BUCKETS\s+(\d+))?""" +
      """\s+AS\s+(.+?)\s*;?\s*""").r
  private val CompactRe =
    """(?is)\s*COMPACT\s+INDEX\s+(\w+)\s*;?\s*""".r
  private val ProbeRe =
    (s"""(?is)\\s*PROBE\\s+(\\w+)\\s+INDEX\\s+($Tbls)""" +
      """(?:\s+K\s+(\d+))?(?:\s+TOMBSTONES\s+(\w+))?(?:\s+QUERIES\s+(\w+))?""" +
      """\s+INTO\s+(\w+)\s+AS\s+(.+?)\s*;?\s*""").r

  private def known(family: String): Boolean =
    families.contains(family.toLowerCase(java.util.Locale.ROOT))

  private[graft] def parseGraftStatement(sqlText: String): Option[LogicalPlan] = {
    val plan: Option[LogicalPlan] = sqlText match {
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
      case CreateRe(family, tables, k, buckets, source) if known(family) =>
        Some(AppendIndexCommand(validateBuild(family, tables),
          splitTables(tables), batchId = 0L, Option(k).map(_.toInt),
          Option(buckets).map(_.toInt), source, create = true))
      case AppendRe(family, tables, batch, k, buckets, source) if known(family) =>
        Some(AppendIndexCommand(validateBuild(family, tables),
          splitTables(tables), batch.toLong, Option(k).map(_.toInt),
          Option(buckets).map(_.toInt), source, create = false))
      case CompactRe(table) =>
        Some(CompactIndexCommand(table))
      case ProbeRe(family, tables, k, tombs, queries, out, source)
          if known(family) =>
        val f = family.toLowerCase(java.util.Locale.ROOT)
        require(probeable(f),
          s"PROBE is SQL-surfaced for ${probeable.toSeq.sorted.mkString(", ")}; " +
            s"'$f' probes pin geometry — use the Scala entry point " +
            "(see graft.ops)")
        require(splitTables(tables).size == families(f)._1,
          s"family '$f' takes ${families(f)._1} INDEX table(s), got '$tables'")
        require(tombs == null || families(f)._2.isDefined,
          s"family '$f' retracts by negated partial — its probe has no " +
            "TOMBSTONES gate (retractions are already folded into the dfs)")
        if (f == "bm25_df")
          require(queries != null,
            "the bm25_df probe scores a fixed query set — name it with " +
              "QUERIES <table-or-view>")
        else
          require(queries == null,
            s"QUERIES applies to the bm25_df probe only; '$f' probes " +
              "take one source")
        Some(ProbeIndexCommand(f, splitTables(tables),
          Option(k).map(_.toInt), Option(tombs), Option(queries), out,
          source))
      case _ => None
    }
    // near-miss diagnostics (ADVICE r18): a statement that is
    // unambiguously graft syntax but failed the grammar must raise the
    // grammar, not fall through to an unrelated Spark ParseException
    if (plan.isEmpty) requireNotNearMiss(sqlText)
    plan
  }

  private val GraftLead =
    ("""(?is)\s*(RETRACT\s+FROM|PURGE\s+RETRACTIONS|APPEND\s+TO\s+\w+\s+INDEX|""" +
      """COMPACT\s+INDEX|PROBE\s+\w+\s+INDEX).*""").r
  private val CreateLead = """(?is)\s*CREATE\s+(\w+)\s+INDEX\b.*""".r

  private def requireNotNearMiss(sqlText: String): Unit = {
    val claimed = sqlText match {
      case GraftLead(_) => true
      // CREATE only belongs to graft when the family word is known —
      // CREATE TABLE/VIEW/INDEX must reach the Spark parser untouched
      case CreateLead(family) => known(family)
      case _ => false
    }
    require(!claimed,
      "malformed graft statement; expected one of:\n" +
        "  CREATE <family> INDEX <t1>[, <t2>] [K <k>] [BUCKETS <b>] AS <select>\n" +
        "  APPEND TO <family> INDEX <t1>[, <t2>] BATCH <n> [K <k>] [BUCKETS <b>] AS <select>\n" +
        "  COMPACT INDEX <t>\n" +
        "  PROBE <family> INDEX <t1>[, <t2>] [K <k>] [TOMBSTONES <tt>] [QUERIES <q>] INTO <out_table> AS <select>\n" +
        "  RETRACT FROM <family> INDEX <t1>[, <t2>] [TOMBSTONES <tt>] BATCH <n> [K <k>] AS <select>\n" +
        "  PURGE RETRACTIONS FROM <family> INDEX <t1>[, <t2>] TOMBSTONES <tt>\n" +
        "(table names must be unqualified — statements run against the " +
        "session default database)\ngot: " + sqlText.trim.take(200))
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

  private def validateBuild(familyRaw: String, tables: String): String = {
    val family = familyRaw.toLowerCase(java.util.Locale.ROOT)
    require(buildable(family),
      s"CREATE/APPEND are SQL-surfaced for " +
        s"${buildable.toSeq.sorted.mkString(", ")}; '$family' builds pin " +
        "geometry a grammar cannot carry — use " +
        "Similarity.buildVectorIndex / buildIvfIndex")
    val given = splitTables(tables).size
    require(given == families(family)._1,
      s"family '$family' takes ${families(family)._1} INDEX table(s), " +
        s"got $given")
    family
  }
}

/** `CREATE <family> INDEX` / `APPEND TO <family> INDEX` — lands one
  * batch through the family's per-batch partial path (the exact code
  * streamed maintenance runs). CREATE is APPEND of batch 0 into a
  * table that must not exist yet — refusing to silently append into a
  * prior index is the create-vs-maintain distinction an operator
  * expects from the keyword. `landed` is false when the batch was
  * swallowed by the fold watermark (a post-fold replay). */
case class AppendIndexCommand(family: String, tables: Seq[String],
                              batchId: Long, k: Option[Int],
                              buckets: Option[Int], sourceSql: String,
                              create: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("family", StringType, nullable = false)(),
    AttributeReference("batch_id", LongType, nullable = false)(),
    AttributeReference("n_source_rows", LongType, nullable = false)(),
    AttributeReference("landed", BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    if (create) tables.foreach { t =>
      require(!spark.catalog.tableExists(t),
        s"$t already exists — APPEND TO it (maintenance) or drop it " +
          "first (rebuild); CREATE never silently extends a prior index")
    }
    val batch = spark.sql(sourceSql)
    val n = batch.count()
    val b = buckets.getOrElse(8)
    val landed = family match {
      case "minhash" =>
        graft.ops.Dedup.appendCorpusIndexPartial(spark, batch, tables(0),
          tables(1), batchId, buckets = b)
        true // posting-list partials have no fold watermark
      case "shingle_df" =>
        graft.ops.Dedup.appendShingleDfPartial(spark, batch, tables(0),
          batchId, buckets = b)
      case "line_df" =>
        graft.ops.TextAnalysis.appendLineDfPartial(spark, batch, tables(0),
          batchId, buckets = b)
      case "window_df" =>
        graft.ops.Dedup.appendWindowDfPartial(spark, batch, tables(0),
          batchId, k = k.getOrElse(8), buckets = b)
      case "token_count" =>
        graft.ops.TextAnalysis.appendTokenCountPartial(spark, batch,
          tables(0), batchId, buckets = b)
      case "bm25_df" =>
        graft.ops.TextAnalysis.appendBm25DfPartial(spark, batch, tables(0),
          batchId, buckets = b)
    }
    Seq(Row(family, batchId, n, landed))
  }
}

/** `COMPACT INDEX <t>` — the table's own maintenance rewrite through
  * the crash-safe two-name swap: the zero-sum-dropping FOLD for
  * additive-df tables (`folded = true`; retracted keys' cancelled row
  * pairs leave the disk and the replay watermark advances), the
  * identity compaction for everything else. `files` is the data file
  * count after the rewrite (one per bucket). */
case class CompactIndexCommand(table: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("folded", BooleanType, nullable = false)(),
    AttributeReference("files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    require(spark.catalog.tableExists(table) ||
        spark.catalog.tableExists(s"${table}_precompact") ||
        spark.catalog.tableExists(s"${table}_compacting"),
      s"$table does not exist — nothing to compact")
    val additive = graft.io.Bucketing.isAdditiveIndex(spark, table)
    val files =
      if (additive) graft.io.Bucketing.foldBucketed(spark, table)
      else graft.io.Bucketing.compactBucketed(spark, table)
    Seq(Row(table, additive, files.toLong))
  }
}

/** `PROBE <family> INDEX <t> INTO <out> AS <select>` — runs the
  * family's incremental probe (the p54/p63/p71/p99-class delta-sized
  * computation) over the source rows against the persisted index and
  * writes the result INTO `outTable` — the probe result stays a
  * distributed table; only its row count returns through the command.
  * Every probe-side guard (kind stamp, layout, negative-fold) fires
  * unchanged. */
case class ProbeIndexCommand(family: String, tables: Seq[String],
                             k: Option[Int], tombstones: Option[String],
                             queriesTable: Option[String],
                             outTable: String, sourceSql: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("family", StringType, nullable = false)(),
    AttributeReference("out_table", StringType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val source = spark.sql(sourceSql)
    val result = family match {
      case "minhash" =>
        // probes through the LIVE tombstone gate when TOMBSTONES names
        // a pending (unpurged) table — retired docs stop matching the
        // instant their retraction lands, before any physical purge
        graft.ops.Dedup.incrementalVerdictsAgainstIndex(spark, source,
          tables(0), tables(1), tombstonesTable = tombstones)
      case "shingle_df" =>
        graft.ops.Dedup.noveltyIncremental(spark, source, tables(0))
      case "line_df" =>
        graft.ops.TextAnalysis.lineDedupIncremental(spark, source, tables(0))
      case "window_df" =>
        graft.ops.Dedup.substringRemoveIncremental(spark, source, tables(0),
          k = k.getOrElse(8))
      case "token_count" =>
        graft.ops.TextAnalysis.vocabCoverageFromStreamedIndex(spark, source,
          tables(0))
      case "bm25_df" =>
        graft.ops.TextAnalysis.bm25TopKIncrementalStreamed(spark, source,
          spark.table(queriesTable.get), tables(0))
    }
    graft.io.Bucketing.dropTable(spark, outTable)
    result.write.format("parquet").saveAsTable(outTable)
    Seq(Row(family, outTable, spark.table(outTable).count()))
  }
}

/** `RETRACT FROM ...` — lands one retraction batch through the exact
  * Scala path of the named family. The AS query runs in the command's
  * session; `n_source_rows` reports the rows it returned (the family
  * dedups ids internally where applicable). `landed` is false when the
  * batch was swallowed by a replay watermark — the purge watermark for
  * the tombstone families, the fold watermark for the negated-partial
  * families (ADVICE r18: the SQL operator must SEE the no-op). */
case class RetractIndexCommand(family: String, tables: Seq[String],
                               tombstones: Option[String], batchId: Long,
                               k: Option[Int], sourceSql: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("family", StringType, nullable = false)(),
    AttributeReference("batch_id", LongType, nullable = false)(),
    AttributeReference("n_source_rows", LongType, nullable = false)(),
    AttributeReference("landed", BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val removed = spark.sql(sourceSql)
    val n = removed.count()
    val landed = family match {
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
    Seq(Row(family, batchId, n, landed))
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
