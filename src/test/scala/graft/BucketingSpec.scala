package graft

import graft.io.Bucketing
import graft.ops.Salting
import org.apache.spark.sql.functions._

/** Co-located bucketed joins (no exchange) and skew salting equivalence. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with no shuffle exchange") {
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"), col("l_extendedprice"))
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    Bucketing.writeBucketed(o, "orders_bkt", "o_orderkey", 8)
    Bucketing.writeBucketed(li, "lineitem_bkt", "o_orderkey", 8)
    // at fixture scale the planner would broadcast instead and skip the
    // bucket layout entirely; force the shuffle-join path the layout is
    // designed for (at 100 TB neither side broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cocolocatedJoin(spark, "orders_bkt", "lineitem_bkt", "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free plan, got:\n$plan")
      // correctness: same count as the plain join
      val plain = o.join(li, Seq("o_orderkey")).count()
      assert(joined.count() === plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted join returns exactly the plain join result") {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val salted = Salting.saltedJoin(o, c, "o_custkey", "c_custkey",
      salts = 4, disambigCol = "o_orderkey")
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bloom semi-join equals exact semi-join (no false negatives)") {
    val li = Tables.lineitem(spark, sfDir)
    val highValue = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 150000)
    val bloomed = graft.ops.BloomJoin.bloomSemiJoin(
      li, highValue, "l_orderkey", "o_orderkey", expectedItems = 2000)
      .select("l_orderkey", "l_linenumber")
    val exact = li.join(highValue, li("l_orderkey") === highValue("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
    assert(bloomed.exceptAll(exact).isEmpty && exact.exceptAll(bloomed).isEmpty)
    // and the pre-filter actually discards most non-members
    val filter = graft.ops.BloomJoin.buildFilter(highValue, "o_orderkey", 2000)
    val kept = li.filter(graft.ops.BloomJoin.mightContain(filter, col("l_orderkey"))).count()
    val total = li.count()
    assert(kept < total, s"bloom filter kept all $total rows")
  }

  test("compactBucketed: one file per bucket, spec preserved, content identical") {
    import graft.io.Bucketing
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    val tbl = "graft_compactspec_tbl"
    Bucketing.dropTable(spark, tbl)
    Bucketing.dropTable(spark, s"${tbl}_compacting")
    // three write waves -> up to 3 files per bucket
    Bucketing.writeBucketed(docs.filter(col("doc_id") % 3 === 0), tbl, "doc_id", 4)
    Bucketing.writeBucketed(docs.filter(col("doc_id") % 3 === 1), tbl, "doc_id", 4,
      org.apache.spark.sql.SaveMode.Append)
    Bucketing.writeBucketed(docs.filter(col("doc_id") % 3 === 2), tbl, "doc_id", 4,
      org.apache.spark.sql.SaveMode.Append)
    val before = Bucketing.dataFileCount(spark, tbl)
    assert(before > 4, s"expected >4 files after three waves, got $before")
    val after = Bucketing.compactBucketed(spark, tbl)
    assert(after <= 4, s"expected <=1 file per bucket after compact, got $after")
    // spec survived the swap …
    val spec = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl)).bucketSpec
    assert(spec.exists(s => s.numBuckets == 4 &&
      s.bucketColumnNames == Seq("doc_id")), s"bucket spec lost: $spec")
    // … the planner still sees a bucketed scan …
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = spark.table(tbl).groupBy(col("doc_id")).count()
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key must stay exchange-free after compact:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    // … and not a row was lost or duplicated
    val got = spark.table(tbl)
    assert(got.count() === docs.count())
    assert(got.exceptAll(docs).isEmpty && docs.exceptAll(got).isEmpty)
    Bucketing.dropTable(spark, tbl)
  }

  test("salted two-phase sum equals direct groupBy sum") {
    val o = Tables.orders(spark, sfDir)
    val salted = Salting.saltedSum(o, "o_custkey", "o_totalprice",
      salts = 8, disambigCol = "o_orderkey")
    val direct = o.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("index-kind stamp: set, read, enforce; unstamped tables pass through") {
    import spark.implicits._
    val tbl = graft.io.TempPaths.scratchTableName(spark, "graft_kind_spec", "t")
    graft.io.Bucketing.dropTable(spark, tbl)
    Seq((1L, 2L)).toDF("h", "df_corpus").write.saveAsTable(tbl)
    // unstamped: requireKind is a no-op either way (legacy/foreign table
    // falls through to the caller's column guard)
    assert(graft.io.Bucketing.tableKind(spark, tbl).isEmpty)
    graft.io.Bucketing.requireKind(spark, tbl, "window-df")
    graft.io.Bucketing.requireKind(spark, tbl, "line-df")
    // stamped: matching kind passes, the other family fails loudly
    graft.io.Bucketing.stampKind(spark, tbl, "window-df")
    assert(graft.io.Bucketing.tableKind(spark, tbl) === Some("window-df"))
    graft.io.Bucketing.requireKind(spark, tbl, "window-df")
    val e = intercept[IllegalArgumentException] {
      graft.io.Bucketing.requireKind(spark, tbl, "line-df")
    }
    assert(e.getMessage.contains("window-df"))
    // restamping is idempotent overwrite, not append
    graft.io.Bucketing.stampKind(spark, tbl, "line-df")
    assert(graft.io.Bucketing.tableKind(spark, tbl) === Some("line-df"))
    graft.io.Bucketing.dropTable(spark, tbl)
  }

  test("recoverPartitionsIfStale: metadata-gated — no-op when healthy, heals a post-rename layout") {
    import spark.implicits._
    val tbl = "graft_stalerec_tbl"
    val other = "graft_stalerec_renamed"
    Seq(tbl, other).foreach(graft.io.Bucketing.dropTable(spark, _))
    Seq((1L, 10L, 0L), (2L, 20L, 0L), (3L, 30L, 1L))
      .toDF("h", "df_corpus", "batch_id")
      .write.partitionBy("batch_id").bucketBy(2, "h").sortBy("h")
      .format("parquet").saveAsTable(tbl)
    val cat = spark.sessionState.catalog
    def ident(t: String) = org.apache.spark.sql.catalyst.TableIdentifier(t)
    def partLocs(t: String) = cat.listPartitions(ident(t)).map(_.location.toString)
    // healthy table: every partition location under the table root, and
    // the gated recover must leave the registered locations IDENTICAL
    // (it took the metadata-only branch; an unconditional recover would
    // also be a no-op in VALUE, so additionally pin the staleness
    // detector itself on both shapes)
    def pathOf(u: String): String =
      new org.apache.hadoop.fs.Path(java.net.URI.create(u)).toUri.getPath.stripSuffix("/")
    val rootBefore = pathOf(cat.getTableMetadata(ident(tbl)).location.toString)
    assert(partLocs(tbl).forall(l => (pathOf(l) + "/").startsWith(rootBefore + "/")))
    val before = partLocs(tbl).sorted
    graft.io.Bucketing.recoverPartitionsIfStale(spark, tbl)
    assert(partLocs(tbl).sorted === before, "healthy layout must be untouched")
    // strand stale locations exactly the way a crash inside the swap
    // does: a raw RENAME moves the directory but not the per-partition
    // catalog paths
    spark.sql(s"ALTER TABLE $tbl RENAME TO $other")
    val rootAfter = pathOf(cat.getTableMetadata(ident(other)).location.toString)
    assert(partLocs(other).exists(l => !(pathOf(l) + "/").startsWith(rootAfter + "/")),
      "rename must strand stale partition locations for this test to mean anything")
    assert(spark.table(other).count() === 0L,
      "stale partition paths read as empty — the failure the recover heals")
    graft.io.Bucketing.recoverPartitionsIfStale(spark, other)
    assert(partLocs(other).forall(l => (pathOf(l) + "/").startsWith(rootAfter + "/")),
      "stale layout must be re-registered under the current root")
    assert(spark.table(other).count() === 3L, "recovered table must read fully")
    graft.io.Bucketing.dropTable(spark, other)
  }
}
