package graft

import graft.functions.{CountMin, KmvAggregator}
import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Sketch properties the catalog oracles cannot express: the count-min
  * guarantee (seeded xxhash64 does not replay in DuckDB) and KMV
  * partition-order invariance (the oracle sees one final answer; the
  * 100 TB claim is that ANY partitioning folds to it).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("count-min estimates dominate exact counts and respect the eps*N bound") {
    val docs = Tables.documents(spark, sfDir)
    val grams = docs.select(
      explode(graft.functions.TextFunctions.word_ngrams(
        graft.ops.TextAnalysis.tokens(col("text")), 2)).as("gram"))
    val exact = grams.groupBy("gram").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val (depth, width) = (4, 1 << 12)
    val sketch = grams.agg(CountMin.count_min(depth, width)(col("gram")))
      .head().getSeq[Long](0).toArray
    // every estimate is an overcount; the standard bound e*N/width holds
    // with prob 1-(1/e)^depth PER KEY — assert the aggregate shape: no
    // undercount ever, and the worst overcount within a loose 4*e*N/width
    val bound = (4 * math.E * n / width).toLong + 1
    val bad = exact.filter { case (g, c) =>
      val est = CountMin.estimate(sketch, g, depth, width)
      est < c || est > c + bound
    }
    assert(bad.isEmpty,
      s"count-min violated bounds for ${bad.size} of ${exact.size} grams")
  }

  test("count-min merge is partition-order invariant") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val grams = docs.select(
      explode(graft.ops.TextAnalysis.tokens(col("text"))).as("g"))
    val a = grams.repartition(1).agg(CountMin.count_min(2, 256)(col("g")))
      .head().getSeq[Long](0)
    val b = grams.repartition(7, col("g"))
      .agg(CountMin.count_min(2, 256)(col("g"))).head().getSeq[Long](0)
    assert(a === b, "sketch must be identical under any partitioning")
  }

  test("KMV sketch is partition-order invariant and keeps the k smallest distinct") {
    val vals = Seq(9L, 3L, 7L, 3L, 1L, 8L, 1L, 5L, 2L, 6L, 4L, 9L)
    val df = vals.toDF("h")
    val k = 5
    val one = df.repartition(1).agg(KmvAggregator.kmv(k)(col("h")))
      .head().getSeq[Long](0)
    val many = df.repartition(6).agg(KmvAggregator.kmv(k)(col("h")))
      .head().getSeq[Long](0)
    assert(one === Seq(1L, 2L, 3L, 4L, 5L))
    assert(many === one, "merge order must not change the kept set")
  }

  test("KMV estimate lands within the theoretical error envelope at fixture scale") {
    val out = Sketches.kmvDistinctTokens(Tables.documents(spark, sfDir), k = 64)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Double]("n_est")
      val exact = r.getAs[Long]("n_exact")
      val nSketch = r.getAs[Long]("n_sketch")
      if (nSketch < 64)
        assert(est === exact.toDouble,
          s"an unsaturated sketch IS the distinct set (lang=${r.getString(0)})")
      else {
        // sigma ~ 1/sqrt(k-2); 5 sigma at k=64 is ~64% relative error
        val rel = math.abs(est - exact) / exact
        assert(rel < 0.64,
          s"lang=${r.getString(0)}: est $est vs exact $exact (rel $rel)")
      }
    }
  }

  test("streamed KMV partials fold EXACTLY to the monolithic sketch") {
    val docs = Tables.documents(spark, sfDir)
    val tbl = "sk_kmv_stream"
    graft.io.Bucketing.dropTable(spark, tbl)
    Seq(0, 1, 2).foreach { i =>
      Sketches.appendKmvPartial(spark,
        docs.filter(pmod(col("doc_id"), lit(3)) === i), tbl, i.toLong)
    }
    val want = rows(Sketches.kmvDistinctTokens(docs, k = 64))
    val got = rows(Sketches.kmvProfileFromStreamedIndex(spark, docs, tbl, k = 64))
    assert(got === want,
      "k-smallest of a union must equal the fold of per-batch k-smallest")
    // replayed batch overwrites its own partition: fold unchanged
    Sketches.appendKmvPartial(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), tbl, 1L)
    assert(rows(Sketches.kmvProfileFromStreamedIndex(spark, docs, tbl, k = 64))
      === want, "batch replay must be idempotent")
    graft.io.Bucketing.dropTable(spark, tbl)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("streamed count-min partials fold to the monolithic sketch; audit booleans hold") {
    val docs = Tables.documents(spark, sfDir)
    val tbl = "sk_cm_stream"
    graft.io.Bucketing.dropTable(spark, tbl)
    Seq(0, 1, 2).foreach { i =>
      Sketches.appendCountMinPartial(spark,
        docs.filter(pmod(col("doc_id"), lit(3)) === i), tbl, i.toLong,
        depth = 2, width = 512)
    }
    // folded partials == one-shot sketch (merge is elementwise addition)
    val folded = spark.table(tbl).groupBy("pos")
      .agg(sum(col("cnt")).as("cnt")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mono = docs.select(col("lang"),
        explode(graft.functions.TextFunctions.word_ngrams(
          graft.ops.TextAnalysis.tokens(col("text")), 2)).as("gram"))
      .select(concat_ws("", col("lang"), col("gram")).as("key"))
      .agg(CountMin.count_min(2, 512)(col("key"))).head().getSeq[Long](0)
    mono.zipWithIndex.foreach { case (v, i) =>
      assert(folded.getOrElse(i, 0L) === v,
        s"counter $i: folded ${folded.getOrElse(i, 0L)} != monolithic $v")
    }
    // audit over the streamed table: both contract booleans true
    val audit = Sketches.countMinHeavyHitterAudit(spark, docs, tbl,
      depth = 2, width = 512).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getBoolean(4), s"est must dominate exact for $r")
      assert(r.getBoolean(5), s"est must sit within the envelope for $r")
    }
    // replayed batch overwrites its own partition: fold unchanged
    Sketches.appendCountMinPartial(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), tbl, 1L,
      depth = 2, width = 512)
    val refolded = spark.table(tbl).groupBy("pos")
      .agg(sum(col("cnt")).as("cnt")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(refolded === folded, "batch replay must be idempotent")
    graft.io.Bucketing.dropTable(spark, tbl)
  }

  test("count-min envelope slack: worst-case overestimate sits well inside the 4x bound") {
    // The q76 oracle hard-codes est_within_eps = TRUE, which is only a
    // probabilistic guarantee (holds per key w.p. 1-(1/e)^depth at the
    // 1x eN/width envelope). The audit uses a 4x envelope; this spec
    // measures the ACTUAL worst-case margin on the fixture so a fixture
    // or parameter change that starts eating the slack fails HERE with
    // numbers, not as an unexplained driver-oracle flake.
    val docs = Tables.documents(spark, sfDir)
    val tbl = "sk_cm_margin"
    graft.io.Bucketing.dropTable(spark, tbl)
    Sketches.appendCountMinPartial(spark, docs, tbl, 0L,
      depth = 2, width = 512)
    val folded = spark.table(tbl).groupBy("pos")
      .agg(sum(col("cnt")).as("cnt")).collect()
    val sketch = new Array[Long](2 * 512)
    folded.foreach(r => sketch(r.getInt(0)) = r.getLong(1))
    val total = sketch.take(512).sum
    val bound = (4 * math.E * total / 512).toLong + 1
    val audit = Sketches.countMinHeavyHitterAudit(spark, docs, tbl,
      depth = 2, width = 512).collect()
    val worst = audit.map { r =>
      val est = graft.functions.CountMin.estimate(sketch,
        r.getString(0) + "" + r.getString(2), 2, 512)
      est - r.getLong(3)
    }.max
    assert(worst <= bound / 2,
      s"count-min overestimate $worst is past half the 4x envelope " +
        s"($bound) — the q76 est_within_eps=TRUE oracle is at risk; " +
        "re-examine width/depth or the fixture before the driver flakes")
    graft.io.Bucketing.dropTable(spark, tbl)
  }

  test("streamed log2-histogram partials fold to the monolithic histogram") {
    val docs = Tables.documents(spark, sfDir)
    val tbl = "sk_hist_stream"
    graft.io.Bucketing.dropTable(spark, tbl)
    Seq(0, 1, 2).foreach { i =>
      Sketches.appendLog2HistogramPartial(spark,
        docs.filter(pmod(col("doc_id"), lit(3)) === i), tbl, i.toLong)
    }
    val mono = rows(Sketches.log2TokenHistogram(docs))
    assert(rows(Sketches.log2HistogramFromStreamedIndex(spark, tbl)) === mono,
      "fold of per-batch partials must equal the one-shot histogram")
    // bin edges honor the log2 contract: lo = 2^bin <= every member,
    // hi = 2^(bin+1)-1, and bins are absolute (no min/max dependence)
    Sketches.log2TokenHistogram(docs).collect().foreach { r =>
      val bin = r.getLong(1); val lo = r.getLong(3); val hi = r.getLong(4)
      assert(lo === (1L << bin) && hi === (1L << (bin + 1)) - 1)
    }
    // replayed batch overwrites its own partition: fold unchanged
    Sketches.appendLog2HistogramPartial(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) === 2), tbl, 2L)
    assert(rows(Sketches.log2HistogramFromStreamedIndex(spark, tbl)) === mono,
      "batch replay must be idempotent")
    graft.io.Bucketing.dropTable(spark, tbl)
  }

  test("source drift: identical distributions score 0, disjoint score 2e6") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", "x x y y"),
      (2L, "srcB", "x x y y"),   // identical distribution to srcA
      (3L, "srcC", "z z z z"))   // disjoint vocabulary
      .toDF("doc_id", "source", "text")
    val got = graft.ops.Sketches.sourceDriftReport(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getString(3), r.getLong(4))).toMap
    // identical: every token's signed contributions cancel exactly;
    // the top-token tie (all d = 0) breaks lexicographically
    assert(got(("srcA", "srcB")) === ((0L, "x", 0L)))
    // disjoint: each side contributes its full mass -> L1 = 2e6 exactly
    // (x 500000 + y 500000 + z 1000000); top token is z at 1e6
    assert(got(("srcA", "srcC")) === ((2000000L, "z", 1000000L)))
    assert(got(("srcB", "srcC")) === ((2000000L, "z", 1000000L)))
  }

  test("incremental drift probe equals the two-source batch compare") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val tbl = "sk_drift_idx"
    graft.io.Bucketing.dropTable(spark, tbl)
    Seq(0, 1).foreach { i =>
      graft.ops.TextAnalysis.appendTokenCountPartial(spark,
        corpus.filter(pmod(col("doc_id"), lit(2)) === i), tbl, i.toLong)
    }
    val inc = graft.ops.Sketches.driftProbeIncremental(spark, delta, tbl)
      .collect().map(_.toString).toSet
    // batch reference: the same docs relabeled corpus/delta through the
    // all-pairs p101 path (two sources -> exactly one pair)
    val labeled = docs.withColumn("source",
      when(pmod(col("doc_id"), lit(5)) === 0, lit("delta"))
        .otherwise(lit("corpus")))
    val batch = graft.ops.Sketches.sourceDriftReport(labeled)
      .collect().map(_.toString).toSet
    assert(inc === batch,
      "index-fold drift must equal the from-scratch two-source compare")
    graft.io.Bucketing.dropTable(spark, tbl)
  }

  test("histogram bins partition the value range exactly") {
    val docs = Tables.documents(spark, sfDir)
    val hist = Sketches.tokenCountHistogram(docs, bins = 16).collect()
    val total = hist.map(_.getAs[Long]("cnt")).sum
    assert(total === docs.count(), "every doc lands in exactly one bin")
    hist.groupBy(_.getString(0)).foreach { case (_, rows) =>
      rows.foreach { r =>
        val bin = r.getAs[Long]("bin")
        assert(bin >= 0 && bin < 16)
        assert(r.getAs[Long]("bin_min") <= r.getAs[Long]("bin_max"))
      }
    }
  }
}
