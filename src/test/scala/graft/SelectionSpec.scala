package graft

import graft.ops.{Dedup, Selection}
import org.apache.spark.sql.functions._

/** Corpus-selection operators: per-group caps, budgeted selection,
  * exact substring overlap. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("groupCappedTopK keeps the best `cap` rows per group with tie-break") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.8), ("a", 3L, 0.8), ("a", 4L, 0.1),
      ("b", 5L, 0.5)).toDF("g", "id", "s")
    val got = Selection.groupCappedTopK(df, col("g"), col("s"), col("id"), cap = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // group a: 0.9 first, then the 0.8 TIE breaks to the smaller id (2)
    assert(got === Set(("a", 1L, 1L, 0.9), ("a", 2L, 2L, 0.8),
      ("b", 1L, 5L, 0.5)))
  }

  test("groupCappedTopK equals the window form on the fixture") {
    val docs = Tables.documents(spark, sfDir)
    val scored = graft.ops.TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality_score"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    val agg = Selection.groupCappedTopK(scored, col("source"),
        col("quality_score"), col("doc_id"), cap = 3)
      .select(col("group_key"), col("rank"), col("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    val win = scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("source").as("group_key"), col("rank"),
        col("doc_id").as("id"))
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty)
  }

  test("budgetSelect running sum equals the global-window form exactly") {
    val df = Seq(
      (1L, 0.95, 10L), (2L, 0.90, 20L), (3L, 0.90, 5L),
      (4L, 0.50, 40L), (5L, 0.10, 100L)).toDF("id", "q", "w")
    val got = Selection.budgetSelect(df, lit(1.0) - col("q"), col("w"),
        col("id"), budget = 35L)
      .select(col("id"), col("cum_weight"), col("is_selected"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // order: id1(10) -> cum 10, id2(20) -> 30, id3(5) -> 35 (== budget:
    // selected), id4 -> 75, id5 -> 175
    assert(got === Set((1L, 10L, true), (2L, 30L, true), (3L, 35L, true),
      (4L, 75L, false), (5L, 175L, false)))
  }

  test("budgetSelect is bucket-count-invariant (exact prefix sums)") {
    val docs = graft.ops.TextAnalysis.qualityScore(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    def run(res: Int) = Selection.budgetSelect(docs,
        lit(1.0) - col("quality_score"), col("n_tokens"), col("doc_id"),
        budget = 2000L, resolution = res)
      .select(col("doc_id"), col("cum_weight"), col("is_selected"))
    val a = run(4)
    val b = run(1024)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("budgetSelect fails loudly on out-of-range, NaN or null ord and null weight") {
    val df = Seq((1L, 0.5, 10L), (2L, 1.5, 20L)).toDF("id", "o", "w")
    // ord > 1 would silently collapse bucketing into the clamped boundary
    // bucket; the contract is enforced per-row instead
    val e1 = intercept[Exception] {
      Selection.budgetSelect(df, col("o"), col("w"), col("id"), budget = 100L)
        .collect()
    }
    assert(e1.getMessage.contains("budgetSelect") ||
      Option(e1.getCause).exists(_.getMessage.contains("budgetSelect")))
    // null ord rows used to VANISH via a null bucket key missing the
    // offsets join; now they fail
    val withNull = Seq((1L, Some(0.5), 10L), (2L, None, 20L))
      .toDF("id", "o", "w")
    val e2 = intercept[Exception] {
      Selection.budgetSelect(withNull, col("o"), col("w"), col("id"), budget = 100L)
        .collect()
    }
    assert(e2.getMessage.contains("budgetSelect") ||
      Option(e2.getCause).exists(_.getMessage.contains("budgetSelect")))
    // reserved output/internal names are rejected up front
    val clash = Seq((1L, 0.5, 10L)).toDF("id", "o", "cum_weight")
    val e3 = intercept[IllegalArgumentException] {
      Selection.budgetSelect(clash, col("o"), col("cum_weight"), col("id"),
        budget = 100L)
    }
    assert(e3.getMessage.contains("reserved"))
  }

  test("substringOverlapPairs finds verbatim shared windows, respects maxDocFreq") {
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val boiler = "COMMON-HEADER-THAT-EVERY-SINGLE-DOCUMENT-CARRIES--"
    val df = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"other intro $shared different tail"),
      (3L, "completely unrelated text with nothing in common here at all"),
      // tails diverge at the FIRST char after the header, so any window
      // crossing the boundary is unique to its doc — 4/5/6 share ONLY
      // the header's windows
      (4L, boiler + "Afour"), (5L, boiler + "Bfive"),
      (6L, boiler + "Csix")).toDF("doc_id", "text")
    val got = Dedup.substringOverlapPairs(df, k = 30, maxDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // docs 1/2 share the 52-char run -> many 30-char windows; the
    // boilerplate header appears in 3 docs > maxDocFreq=2 -> its windows
    // are dropped, so 4/5/6 must not pair
    assert(got === Set((1L, 2L)))
    val n = Dedup.substringOverlapPairs(df, k = 30, maxDocFreq = 2)
      .filter(col("left_id") === 1L).select(col("n_shared_windows"))
      .as[Long].head()
    // the shared run includes the flanking spaces both docs carry
    assert(n === (shared.length + 2 - 30 + 1).toLong,
      "every stride-1 window of the shared run must count once")
  }

  test("incrementalMinhashVerdicts matches the exact delta-vs-corpus truth") {
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val got = Dedup.incrementalMinhashVerdicts(corpus, delta,
      bands = 16, rowsPerBand = 8, shingleN = 3, threshold = 0.7)
    // one verdict row per delta doc, no delta doc lost or duplicated
    assert(got.count() === delta.count())
    assert(got.select("doc_id").distinct().count() === delta.count())
    // exact truth: per delta doc, best corpus match with jaccard >= 0.7
    // (3-gram word shingles, the banded path must have full recall here)
    val sh = (d: org.apache.spark.sql.DataFrame, p: String) => d.select(
      col("doc_id").as(s"${p}_id"),
      Dedup.shingles(col("text"), 3).as(s"${p}_sh"))
    val exact = sh(delta, "d").crossJoin(sh(corpus, "c"))
      .withColumn("j", round(graft.functions.TextFunctions.array_jaccard(
        col("d_sh"), col("c_sh")), 6))
      .filter(col("j") >= 0.7)
      .groupBy(col("d_id"))
      .agg(max(struct(col("j"), (-col("c_id")).as("n"))).as("m"))
      .select(col("d_id").as("doc_id"), col("m.j").as("jaccard"),
        (-col("m.n")).cast("long").as("dup_of"))
    val gotDups = got.filter(col("is_dup"))
      .select(col("doc_id"), col("jaccard"), col("dup_of"))
    assert(gotDups.exceptAll(exact).isEmpty && exact.exceptAll(gotDups).isEmpty,
      "banded verdicts must equal the exact all-pairs truth")
    assert(gotDups.count() > 0, "fixture contains known near-dups")
  }

  test("p55 curation pipeline invariants: one rep per group, cap respected, prefix budget") {
    val out = graft.queries.RecallQueries.curationPipeline(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    // at most `cap` rows per source, ranks 1..k dense
    val bySource = out.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (s, rows) =>
      assert(rows.length <= 10, s"source $s exceeds the per-source cap")
      assert(rows.map(_.getAs[Long]("cap_rank")).sorted.toSeq ===
        (1L to rows.length).toSeq, s"source $s ranks must be dense from 1")
    }
    // the budget is a PREFIX property in the (1 - rep_score, doc_id)
    // order: cum_tokens strictly increases and is_selected never
    // re-activates after the first overflow
    val ordered = out.sortBy(r =>
      (1.0 - r.getAs[Double]("rep_score"), r.getAs[Long]("doc_id")))
    var cum = 0L
    var overflowed = false
    ordered.foreach { r =>
      cum += r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("cum_tokens") === cum,
        "cum_tokens must be the exact running sum in selection order")
      val sel = r.getAs[Boolean]("is_selected")
      assert(sel === (cum <= 10000L))
      if (overflowed) assert(!sel, "selection must be a prefix")
      if (!sel) overflowed = true
    }
    // representatives only: no two output docs share a dedup group
    val docs = Tables.documents(spark, sfDir)
    val groups = graft.ops.Dedup.dedupGroups(docs,
      graft.ops.Dedup.blockedNgramJaccardPairs(docs))
    val outIds = out.map(_.getAs[Long]("doc_id")).toSet
    val groupOf = groups.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("group_id")).toMap
    val seen = outIds.toSeq.map(groupOf)
    assert(seen.distinct.size === seen.size,
      "two curated docs share a near-dup group — representative stage leaked")
  }

  test("dedupReport invariants: keepers + duplicates = docs, one keeper per group") {
    val r = graft.queries.RecallQueries.dedupReport(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    val (nDocs, nGroups, nDupDocs) = (row.getAs[Long]("n_docs"),
      row.getAs[Long]("n_groups"), row.getAs[Long]("n_dup_docs"))
    // each component keeps exactly one doc, so groups + dups = docs
    assert(nGroups + nDupDocs === nDocs)
    assert(row.getAs[Long]("largest_group") >= 1L)
    assert(row.getAs[Double]("dup_rate") ===
      math.rint(nDupDocs.toDouble / nDocs * 1e6) / 1e6)
  }

  test("substringOverlapPairs catches short exact duplicates via clipping") {
    val df = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "tiny different"))
      .toDF("doc_id", "text")
    val got = Dedup.substringOverlapPairs(df, k = 30, maxDocFreq = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 1L)))
  }

  test("shardShuffle: deterministic permutation, dense per-shard positions, salt changes order") {
    import org.apache.spark.sql.functions.col
    val docs = (0L until 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = graft.ops.Selection.shardShuffle(docs, shards = 8).collect()
    val b = graft.ops.Selection.shardShuffle(docs, shards = 8).collect()
    // reproducible bit-for-bit
    assert(a.map(_.toSeq).toSet === b.map(_.toSeq).toSet)
    // every doc exactly once; positions dense 1..n within each shard
    assert(a.map(_.getLong(2)).toSet === (0L until 200L).toSet)
    a.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // a different salt is a different permutation (shard+position map)
    val c = graft.ops.Selection.shardShuffle(docs, shards = 8, salt = "shuf2")
      .collect()
    val posA = a.map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1)))).toMap
    val posC = c.map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1)))).toMap
    assert((0L until 200L).count(d => posA(d) != posC(d)) > 150)
    // one exchange on shard, no single-partition global window
    val plan = graft.ops.Selection.shardShuffle(docs, shards = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }
}
