package graft

import graft.io.Bucketing
import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Randomized multi-kill chaos over one streamed-index lifecycle.
  *
  * RecoverySpec proves each failure mode in isolation (one kill, one
  * recovery); this suite composes them: across a full
  * build → append → compact → probe lifecycle of the line-df index, a
  * seeded RNG schedules torn batch commits (a strict subset of the
  * batch persisted under its batch_id — the partial-job-commit window),
  * compaction swaps killed at either failpoint, repairs that sometimes
  * run promptly and sometimes are left for the NEXT maintenance entry
  * to perform, and batch splits that change every seed. Whatever the
  * schedule, the surviving index must fold to exactly the
  * monolithically-built document frequencies — the invariant every
  * individual recovery path claims to preserve, here checked under
  * their interleavings. Seeds are fixed (0 until N) and each assertion
  * carries its seed, so any failure is replayable verbatim.
  *
  * This is the test that catches cross-step interactions single-kill
  * tests can't: e.g. a compaction rewrite that silently dropped the
  * batch_id partition layout would make the next append's
  * dynamic-partition-overwrite truncate the whole index, and an append
  * entering while the index sits under its _precompact backup name
  * would re-create a fresh index and orphan every earlier batch —
  * both now guarded in the production code and exercised here.
  */
class ChaosSpec extends SparkSpec {
  import spark.implicits._

  private val Seeds = 24

  // small corpus with deliberate line overlap: shared boilerplate lines
  // (df > 1 across docs and batches) plus per-doc unique lines
  private lazy val corpus = (1L to 20L).map { id =>
    val shared = s"shared boilerplate ${id % 3}"
    val also = if (id % 2 == 0) "even docs carry this line\n" else ""
    (id, s"$shared\n${also}unique line of doc $id")
  }.toDF("doc_id", "text")

  private lazy val delta = Seq(
    (100L, "shared boilerplate 1\nfresh delta line"),
    (101L, "even docs carry this line\nanother delta line"),
    (102L, "all mine\nnothing shared")).toDF("doc_id", "text")

  test(s"$Seeds seeded multi-kill lifecycles all converge on the batch-built index") {
    val refTbl = "chaos_ref_linedf"
    Bucketing.dropTable(spark, refTbl)
    TextAnalysis.buildLineDfIndex(corpus, refTbl, byLines = true, buckets = 2)
    val want = spark.table(refTbl)
    val wantProbe = TextAnalysis.lineDedup(corpus.unionByName(delta),
      byLines = true).filter(col("doc_id") >= 100L)

    val ids = (1L to 20L).toVector
    for (seed <- 0 until Seeds) {
      val rnd = new scala.util.Random(seed)
      val tbl = s"chaos_linedf_s$seed"
      Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
        .foreach(Bucketing.dropTable(spark, _))

      // seed-dependent disjoint batch split (1–4 batches, random sizes)
      val shuffled = rnd.shuffle(ids)
      val nBatches = 1 + rnd.nextInt(4)
      val cuts = Vector.fill(nBatches - 1)(rnd.nextInt(ids.size + 1))
        .sorted :+ ids.size
      val batches = (0 +: cuts).sliding(2).map {
        case Seq(a, b) => shuffled.slice(a, b) }.toVector

      def append(docIds: Vector[Long], bid: Long): Unit =
        TextAnalysis.appendLineDfPartial(spark,
          corpus.filter(col("doc_id").isin(docIds: _*)), tbl, bid,
          byLines = true, buckets = 2)

      def maybeCompact(): Unit = if (rnd.nextDouble() < 0.35) {
        val crashStep = rnd.nextInt(3) // 0 = clean compact, 1/2 = failpoints
        if (crashStep == 0) Bucketing.compactBucketed(spark, tbl)
        else {
          intercept[IllegalStateException] {
            Bucketing.compactBucketed(spark, tbl, injectCrashAtSwapStep = crashStep)
          }
          // sometimes repair promptly, sometimes leave the torn swap for
          // the next maintenance/append/probe entry to repair
          if (rnd.nextBoolean()) Bucketing.repairCompaction(spark, tbl)
        }
      }

      for ((b, bid) <- batches.zipWithIndex) {
        // torn commit first, with some probability: a strict subset of
        // the batch persists under its batch_id (docs dropped, and for
        // some seeds a doc's line set truncated by reading only part of
        // the text — approximated here at doc granularity)
        if (b.nonEmpty && rnd.nextDouble() < 0.45) {
          val torn = rnd.shuffle(b).take(rnd.nextInt(b.size))
          if (torn.nonEmpty) append(torn, bid.toLong)
        }
        append(b, bid.toLong) // the WAL replay / real attempt
        maybeCompact()
      }

      withClue(s"seed=$seed batches=${batches.map(_.size)}: ") {
        // probe-side entry self-repairs any torn swap left dangling
        val got = TextAnalysis.lineDedupIncremental(spark, delta, tbl,
          byLines = true)
        assert(got.exceptAll(wantProbe).isEmpty && wantProbe.exceptAll(got).isEmpty,
          "probe after chaos must equal the global rewrite")
        val folded = spark.table(tbl).groupBy("h")
          .agg(sum(col("df_corpus")).cast("long").as("df_corpus"))
        assert(folded.exceptAll(want).isEmpty && want.exceptAll(folded).isEmpty,
          "surviving index must fold to the batch-built dfs")
      }
      Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
        .foreach(Bucketing.dropTable(spark, _))
    }
    Bucketing.dropTable(spark, refTbl)
  }

  // window-df twin of the corpus: every doc opens with one of three
  // shared 8-token spans (duplicated across docs and batches) and closes
  // with unique tokens, so removals span batch boundaries
  private lazy val wCorpus = (1L to 20L).map { id =>
    val s = id % 3
    (id, s"common span number s$s alpha beta gamma delta unique$id tail$id")
  }.toDF("doc_id", "text")

  private lazy val wDelta = Seq(
    (100L, "common span number s1 alpha beta gamma delta fresh delta tokens"),
    (101L, "all novel words here nothing shared with anyone at all"),
    (102L, "common span number s0 alpha beta gamma delta more new ones"))
    .toDF("doc_id", "text")

  test("12 seeded multi-kill lifecycles converge for the window-df index too") {
    val refTbl = "chaos_ref_windf"
    Bucketing.dropTable(spark, refTbl)
    graft.ops.Dedup.buildWindowDfIndex(wCorpus, refTbl, k = 8, buckets = 2)
    val want = spark.table(refTbl)
    val wantProbe = graft.ops.Dedup.substringRemoveIncremental(
      spark, wDelta, refTbl, k = 8)

    val ids = (1L to 20L).toVector
    for (seed <- 0 until 12) {
      val rnd = new scala.util.Random(1000 + seed)
      val tbl = s"chaos_windf_s$seed"
      Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
        .foreach(Bucketing.dropTable(spark, _))
      val shuffled = rnd.shuffle(ids)
      val nBatches = 1 + rnd.nextInt(4)
      val cuts = Vector.fill(nBatches - 1)(rnd.nextInt(ids.size + 1))
        .sorted :+ ids.size
      val batches = (0 +: cuts).sliding(2).map {
        case Seq(a, b) => shuffled.slice(a, b) }.toVector

      def append(docIds: Vector[Long], bid: Long): Unit =
        graft.ops.Dedup.appendWindowDfPartial(spark,
          wCorpus.filter(col("doc_id").isin(docIds: _*)), tbl, bid,
          k = 8, buckets = 2)

      for ((b, bid) <- batches.zipWithIndex) {
        if (b.nonEmpty && rnd.nextDouble() < 0.45) {
          val torn = rnd.shuffle(b).take(rnd.nextInt(b.size))
          if (torn.nonEmpty) append(torn, bid.toLong)
        }
        append(b, bid.toLong)
        if (rnd.nextDouble() < 0.35) {
          val crashStep = rnd.nextInt(3)
          if (crashStep == 0) Bucketing.compactBucketed(spark, tbl)
          else {
            intercept[IllegalStateException] {
              Bucketing.compactBucketed(spark, tbl,
                injectCrashAtSwapStep = crashStep)
            }
            if (rnd.nextBoolean()) Bucketing.repairCompaction(spark, tbl)
          }
        }
      }

      withClue(s"seed=${1000 + seed} batches=${batches.map(_.size)}: ") {
        val got = graft.ops.Dedup.substringRemoveIncremental(
          spark, wDelta, tbl, k = 8)
        assert(got.exceptAll(wantProbe).isEmpty && wantProbe.exceptAll(got).isEmpty,
          "window-df probe after chaos must equal the batch-indexed probe")
        val folded = spark.table(tbl).groupBy("h")
          .agg(sum(col("df_corpus")).cast("long").as("df_corpus"))
        assert(folded.exceptAll(want).isEmpty && want.exceptAll(folded).isEmpty,
          "surviving window index must fold to the batch-built counts")
      }
      Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
        .foreach(Bucketing.dropTable(spark, _))
    }
    Bucketing.dropTable(spark, refTbl)
  }

  // BM25 twin: overlapping vocabulary across docs and batches (shared
  // terms change df when batches merge) plus per-doc unique terms; the
  // delta carries the query doc (id 100 -> doc_id % 100 == 0)
  private lazy val bCorpus = (1L to 20L).map { id =>
    (id, s"shared${id % 3} common words unique$id tail$id")
  }.toDF("doc_id", "text")

  private lazy val bDelta = Seq(
    (100L, "shared1 common query terms here"),
    (101L, "shared0 words fresh delta"),
    (102L, "entirely novel delta body")).toDF("doc_id", "text")

  test("10 seeded multi-kill lifecycles converge for the streamed BM25 index too") {
    val refIdx = "chaos_ref_bm25"; val refSt = "chaos_ref_bm25st"
    Seq(refIdx, refSt).foreach(Bucketing.dropTable(spark, _))
    TextAnalysis.buildBm25DfIndex(bCorpus, refIdx, refSt, buckets = 2)
    val queries = bDelta.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"),
        explode(slice(TextAnalysis.tokens(col("text")), 1, 3)).as("term"))
      .distinct()
    val wantProbe = TextAnalysis.bm25TopKIncremental(
      spark, bDelta, queries, refIdx, refSt)

    val ids = (1L to 20L).toVector
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(2000 + seed)
      val tbl = s"chaos_bm25_s$seed"
      Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
        .foreach(Bucketing.dropTable(spark, _))
      val shuffled = rnd.shuffle(ids)
      val nBatches = 1 + rnd.nextInt(4)
      val cuts = Vector.fill(nBatches - 1)(rnd.nextInt(ids.size + 1))
        .sorted :+ ids.size
      val batches = (0 +: cuts).sliding(2).map {
        case Seq(a, b) => shuffled.slice(a, b) }.toVector

      def append(docIds: Vector[Long], bid: Long): Unit =
        TextAnalysis.appendBm25DfPartial(spark,
          bCorpus.filter(col("doc_id").isin(docIds: _*)), tbl, bid,
          buckets = 2)

      for ((b, bid) <- batches.zipWithIndex) {
        if (b.nonEmpty && rnd.nextDouble() < 0.45) {
          val torn = rnd.shuffle(b).take(rnd.nextInt(b.size))
          if (torn.nonEmpty) append(torn, bid.toLong)
        }
        append(b, bid.toLong)
        if (rnd.nextDouble() < 0.35) {
          val crashStep = rnd.nextInt(3)
          if (crashStep == 0) Bucketing.compactBucketed(spark, tbl)
          else {
            intercept[IllegalStateException] {
              Bucketing.compactBucketed(spark, tbl,
                injectCrashAtSwapStep = crashStep)
            }
            if (rnd.nextBoolean()) Bucketing.repairCompaction(spark, tbl)
          }
        }
      }

      withClue(s"seed=${2000 + seed} batches=${batches.map(_.size)}: ") {
        // probe-side entry self-repairs any torn swap left dangling
        val got = TextAnalysis.bm25TopKIncrementalStreamed(
          spark, bDelta, queries, tbl)
        assert(got.exceptAll(wantProbe).isEmpty && wantProbe.exceptAll(got).isEmpty,
          "streamed BM25 probe after chaos must equal the batch-indexed probe")
        // sentinel stats must fold to the monolithic corpus stats
        val st = spark.table(tbl).filter(col("term").startsWith(" "))
          .groupBy("term").agg(sum(col("df_corpus")).cast("long").as("v"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val refStats = spark.table(refSt).head()
        assert(st(" n") === refStats.getLong(0) &&
          st(" tot") === refStats.getLong(1),
          "sentinel stats must fold to the monolithic corpus stats")
      }
      Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
        .foreach(Bucketing.dropTable(spark, _))
    }
    Seq(refIdx, refSt).foreach(Bucketing.dropTable(spark, _))
  }

  test("10 seeded multi-kill lifecycles converge for the streamed minhash index") {
    // the two-table variant of the bm25 lifecycle: bands (multi-key
    // bucketed) + sigs (single-key), torn partial appends, compaction
    // crashes on EITHER table, probe-side self-repair
    val refBands = "chaos_ref_mh_bands"; val refSigs = "chaos_ref_mh_sigs"
    Seq(refBands, refSigs).foreach(Bucketing.dropTable(spark, _))
    Dedup.buildCorpusIndex(corpus, refBands, refSigs, buckets = 2)
    val wantProbe = Dedup.incrementalVerdictsAgainstIndex(
      spark, delta, refBands, refSigs)

    val ids = (1L to 20L).toVector
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(3000 + seed)
      val bTbl = s"chaos_mh_bands_s$seed"; val sTbl = s"chaos_mh_sigs_s$seed"
      Seq(bTbl, sTbl).flatMap(t =>
        Seq(t, s"${t}_compacting", s"${t}_precompact"))
        .foreach(Bucketing.dropTable(spark, _))
      val shuffled = rnd.shuffle(ids)
      val nBatches = 1 + rnd.nextInt(4)
      val cuts = Vector.fill(nBatches - 1)(rnd.nextInt(ids.size + 1))
        .sorted :+ ids.size
      val batches = (0 +: cuts).sliding(2).map {
        case Seq(a, b) => shuffled.slice(a, b) }.toVector

      def append(docIds: Vector[Long], bid: Long): Unit =
        Dedup.appendCorpusIndexPartial(spark,
          corpus.filter(col("doc_id").isin(docIds: _*)), bTbl, sTbl,
          bid, buckets = 2)

      for ((b, bid) <- batches.zipWithIndex) {
        if (b.nonEmpty && rnd.nextDouble() < 0.45) {
          // torn attempt: a PARTIAL batch lands, then the full retry
          val torn = rnd.shuffle(b).take(rnd.nextInt(b.size))
          if (torn.nonEmpty) append(torn, bid.toLong)
        }
        append(b, bid.toLong)
        if (rnd.nextDouble() < 0.35) {
          // compact a random one of the two tables, maybe crashing
          val victim = if (rnd.nextBoolean()) bTbl else sTbl
          val crashStep = rnd.nextInt(3)
          if (crashStep == 0) Bucketing.compactBucketed(spark, victim)
          else {
            intercept[IllegalStateException] {
              Bucketing.compactBucketed(spark, victim,
                injectCrashAtSwapStep = crashStep)
            }
            if (rnd.nextBoolean()) Bucketing.repairCompaction(spark, victim)
          }
        }
      }

      withClue(s"seed=${3000 + seed} batches=${batches.map(_.size)}: ") {
        // probe-side entries self-repair any torn swap left dangling
        Seq(bTbl, sTbl).foreach(Bucketing.repairCompaction(spark, _))
        val got = Dedup.incrementalVerdictsAgainstIndex(
          spark, delta, bTbl, sTbl)
        assert(got.exceptAll(wantProbe).isEmpty &&
          wantProbe.exceptAll(got).isEmpty,
          "streamed minhash probe after chaos must equal the batch-indexed probe")
      }
      Seq(bTbl, sTbl).flatMap(t =>
        Seq(t, s"${t}_compacting", s"${t}_precompact"))
        .foreach(Bucketing.dropTable(spark, _))
    }
    Seq(refBands, refSigs).foreach(Bucketing.dropTable(spark, _))
  }

  test("10 seeded multi-kill lifecycles converge for the streamed token-count index") {
    // reference: the whole corpus landed as ONE append — both probes
    // (delta drift, vocab coverage) must be reachable bit-identically
    // through any torn/killed/compacted batch history
    val refTbl = "chaos_ref_tok"
    Bucketing.dropTable(spark, refTbl)
    TextAnalysis.appendTokenCountPartial(spark, bCorpus, refTbl, 0L, buckets = 2)
    val wantDrift = graft.ops.Sketches
      .driftProbeIncremental(spark, bDelta, refTbl)
      .collect().map(_.toString).toSet
    val langDocs = bCorpus.withColumn("lang",
      concat(lit("l"), (col("doc_id") % 2).cast("string")))
    val wantCov = TextAnalysis.vocabCoverageFromStreamedIndex(
      spark, langDocs, refTbl, vocabSize = 4)
      .collect().map(_.toString).toSet

    val ids = (1L to 20L).toVector
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(3000 + seed)
      val tbl = s"chaos_tok_s$seed"
      Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
        .foreach(Bucketing.dropTable(spark, _))
      val shuffled = rnd.shuffle(ids)
      val nBatches = 1 + rnd.nextInt(4)
      val cuts = Vector.fill(nBatches - 1)(rnd.nextInt(ids.size + 1))
        .sorted :+ ids.size
      val batches = (0 +: cuts).sliding(2).map {
        case Seq(a, b) => shuffled.slice(a, b) }.toVector

      def append(docIds: Vector[Long], bid: Long): Unit =
        TextAnalysis.appendTokenCountPartial(spark,
          bCorpus.filter(col("doc_id").isin(docIds: _*)), tbl, bid,
          buckets = 2)

      for ((b, bid) <- batches.zipWithIndex) {
        if (b.nonEmpty && rnd.nextDouble() < 0.45) {
          val torn = rnd.shuffle(b).take(rnd.nextInt(b.size))
          if (torn.nonEmpty) append(torn, bid.toLong)  // torn first try
        }
        append(b, bid.toLong)                          // replay heals
        if (rnd.nextDouble() < 0.35) {
          val crashStep = rnd.nextInt(3)
          if (crashStep == 0) Bucketing.compactBucketed(spark, tbl)
          else {
            intercept[IllegalStateException] {
              Bucketing.compactBucketed(spark, tbl,
                injectCrashAtSwapStep = crashStep)
            }
            if (rnd.nextBoolean()) Bucketing.repairCompaction(spark, tbl)
          }
        }
      }

      withClue(s"seed=${3000 + seed} batches=${batches.map(_.size)}: ") {
        val gotDrift = graft.ops.Sketches
          .driftProbeIncremental(spark, bDelta, tbl)
          .collect().map(_.toString).toSet
        assert(gotDrift === wantDrift,
          "drift probe after chaos must equal the one-append reference")
        val gotCov = TextAnalysis.vocabCoverageFromStreamedIndex(
          spark, langDocs, tbl, vocabSize = 4)
          .collect().map(_.toString).toSet
        assert(gotCov === wantCov,
          "coverage probe after chaos must equal the one-append reference")
      }
      Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
        .foreach(Bucketing.dropTable(spark, _))
    }
    Bucketing.dropTable(spark, refTbl)
  }

  test("10 seeded multi-kill lifecycles converge for the streamed shingle-df index") {
    // reference: the whole corpus landed as ONE append — the novelty
    // probe must be reachable bit-identically through any
    // torn/killed/compacted batch history (dfs add, so every disjoint
    // batch decomposition folds to the same global counts)
    val refTbl = "chaos_ref_shdf"
    Bucketing.dropTable(spark, refTbl)
    Dedup.appendShingleDfPartial(spark, bCorpus, refTbl, 0L, buckets = 2)
    val want = Dedup.noveltyIncremental(spark, bDelta, refTbl)
      .collect().map(_.toString).toSet

    val ids = (1L to 20L).toVector
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(4000 + seed)
      val tbl = s"chaos_shdf_s$seed"
      Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
        .foreach(Bucketing.dropTable(spark, _))
      val shuffled = rnd.shuffle(ids)
      val nBatches = 1 + rnd.nextInt(4)
      val cuts = Vector.fill(nBatches - 1)(rnd.nextInt(ids.size + 1))
        .sorted :+ ids.size
      val batches = (0 +: cuts).sliding(2).map {
        case Seq(a, b) => shuffled.slice(a, b) }.toVector

      def append(docIds: Vector[Long], bid: Long): Unit =
        Dedup.appendShingleDfPartial(spark,
          bCorpus.filter(col("doc_id").isin(docIds: _*)), tbl, bid,
          buckets = 2)

      for ((b, bid) <- batches.zipWithIndex) {
        if (b.nonEmpty && rnd.nextDouble() < 0.45) {
          val torn = rnd.shuffle(b).take(rnd.nextInt(b.size))
          if (torn.nonEmpty) append(torn, bid.toLong)  // torn first try
        }
        append(b, bid.toLong)                          // replay heals
        if (rnd.nextDouble() < 0.35) {
          val crashStep = rnd.nextInt(3)
          if (crashStep == 0) Bucketing.compactBucketed(spark, tbl)
          else {
            intercept[IllegalStateException] {
              Bucketing.compactBucketed(spark, tbl,
                injectCrashAtSwapStep = crashStep)
            }
            if (rnd.nextBoolean()) Bucketing.repairCompaction(spark, tbl)
          }
        }
      }

      withClue(s"seed=${4000 + seed} batches=${batches.map(_.size)}: ") {
        val got = Dedup.noveltyIncremental(spark, bDelta, tbl)
          .collect().map(_.toString).toSet
        assert(got === want,
          "novelty probe after chaos must equal the one-append reference")
      }
      Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
        .foreach(Bucketing.dropTable(spark, _))
    }
    Bucketing.dropTable(spark, refTbl)
  }

  test("a torn two-table BM25 build (df index landed, stats crash) heals on rerun") {
    // buildBm25DfIndex writes idxTbl before statsTbl; a crash between the
    // two leaves exactly this state. The p91 rebuild guard must treat it
    // as absent (guard on BOTH tables), not skip the rebuild and then
    // fail the probe on the missing stats table.
    val idx = "chaos_torn_bm25"; val st = "chaos_torn_bm25st"
    Seq(idx, st).foreach(Bucketing.dropTable(spark, _))
    TextAnalysis.buildBm25DfIndex(bCorpus, idx, st, buckets = 2)
    val queries = bDelta.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"),
        explode(slice(TextAnalysis.tokens(col("text")), 1, 3)).as("term"))
      .distinct()
    val want = TextAnalysis.bm25TopKIncremental(spark, bDelta, queries, idx, st)
      .collect().toSet
    Bucketing.dropTable(spark, st) // the torn state
    // the p91 entry's guard: either table absent -> drop BOTH, rebuild
    if (!spark.catalog.tableExists(idx) || !spark.catalog.tableExists(st)) {
      Seq(idx, st).foreach(Bucketing.dropTable(spark, _))
      TextAnalysis.buildBm25DfIndex(bCorpus, idx, st, buckets = 2)
    }
    val got = TextAnalysis.bm25TopKIncremental(spark, bDelta, queries, idx, st)
      .collect().toSet
    assert(got === want, "healed rebuild must reproduce the untorn probe")
    Seq(idx, st).foreach(Bucketing.dropTable(spark, _))
  }

  test("a streamed bm25-df table stripped of sentinel stats fails loudly, not NoSuchElement") {
    val tbl = "chaos_nostats_bm25"
    Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
      .foreach(Bucketing.dropTable(spark, _))
    TextAnalysis.appendBm25DfPartial(spark, bCorpus, tbl, 0L, buckets = 2)
    // strip the sentinel rows by overwriting the lone batch partition
    // with term rows only (what a zero-landed-batch or damaged index
    // presents to the probe)
    val termsOnly = spark.table(tbl).filter(!col("term").startsWith(" "))
      .select("term", "df_corpus", "batch_id").cache()
    termsOnly.count()
    graft.io.Bucketing.overwritePartitions(termsOnly, tbl)
    val queries = bDelta.select(col("doc_id").as("query_id"),
      explode(TextAnalysis.tokens(col("text"))).as("term")).distinct()
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopKIncrementalStreamed(spark, bDelta, queries, tbl)
    }
    assert(ex.getMessage.contains("sentinel corpus stats"),
      s"diagnosable error expected, got: ${ex.getMessage}")
    termsOnly.unpersist()
    Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
      .foreach(Bucketing.dropTable(spark, _))
  }

  test("compacting a partitioned+bucketed index preserves BOTH layouts") {
    val tbl = "chaos_part_compact"
    Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
      .foreach(Bucketing.dropTable(spark, _))
    TextAnalysis.appendLineDfPartial(spark,
      corpus.filter(col("doc_id") <= 10L), tbl, 0L, byLines = true, buckets = 2)
    TextAnalysis.appendLineDfPartial(spark,
      corpus.filter(col("doc_id") > 10L), tbl, 1L, byLines = true, buckets = 2)
    val before = spark.table(tbl)
      .groupBy("h").agg(sum(col("df_corpus")).cast("long").as("df")).collect().toSet
    Bucketing.compactBucketed(spark, tbl)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl))
    assert(meta.partitionColumnNames === Seq("batch_id"),
      "compaction must keep the batch_id partition layout")
    assert(meta.bucketSpec.exists(_.bucketColumnNames == Seq("h")),
      "compaction must keep the bucket spec")
    val after = spark.table(tbl)
      .groupBy("h").agg(sum(col("df_corpus")).cast("long").as("df")).collect().toSet
    assert(after === before, "compaction must not change any df")
    // and the NEXT append still lands as a partition overwrite, not a
    // table truncation (the failure a dropped partition layout causes)
    TextAnalysis.appendLineDfPartial(spark,
      delta.select(col("doc_id"), col("text")), tbl, 2L,
      byLines = true, buckets = 2)
    assert(spark.table(tbl).select("batch_id").distinct().count() === 3L,
      "append after compaction must add its partition, not truncate")
    Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
      .foreach(Bucketing.dropTable(spark, _))
  }

  // --- tombstone-retraction lifecycle chaos (minhash family) ---------
  // near-dup-bearing corpus: three text families shared across docs so
  // banding produces real candidates; delta docs are near-dups of
  // family 1, poison docs are EXACT twins of the delta
  private lazy val mCorpus = (1L to 12L).map { id =>
    val fam = id % 3
    (id, s"family $fam shared minhash text alpha beta gamma delta " +
      s"epsilon zeta eta theta iota kappa doc tail $id")
  }.toDF("doc_id", "text")
  private lazy val mDelta = Seq(
    (100L, "family 1 shared minhash text alpha beta gamma delta " +
      "epsilon zeta eta theta iota kappa doc tail 7"),
    (101L, "completely novel delta document nothing shared with corpus " +
      "words all fresh here truly"))
    .toDF("doc_id", "text")

  test("12 seeded multi-kill lifecycles: tombstone retraction + purge converge on the clean index") {
    val refB = "chaos_ref_mh_bands"; val refS = "chaos_ref_mh_sigs"
    Seq(refB, refS).foreach(Bucketing.dropTable(spark, _))
    Dedup.buildCorpusIndex(mCorpus, refB, refS, bands = 8, rowsPerBand = 4,
      buckets = 2)
    val wantProbe = Dedup.incrementalVerdictsAgainstIndex(spark, mDelta,
      refB, refS, bands = 8, rowsPerBand = 4).collect().map(_.toString).toSet
    val poison = mDelta.withColumn("doc_id", col("doc_id") + lit(10000000L))
    val poisonIds = Vector(10000100L, 10000101L)

    val ids = (1L to 12L).toVector
    for (seed <- 0 until 12) {
      val rnd = new scala.util.Random(7000 + seed)
      val tb = s"chaos_mh_b_s$seed"; val ts = s"chaos_mh_s_s$seed"
      val tt = s"chaos_mh_t_s$seed"
      Seq(tb, ts, tt).flatMap(t =>
          Seq(t, s"${t}_compacting", s"${t}_precompact"))
        .foreach(Bucketing.dropTable(spark, _))

      def append(docIds: Vector[Long], df: org.apache.spark.sql.DataFrame,
                 bid: Long): Unit =
        Dedup.appendCorpusIndexPartial(spark,
          df.filter(col("doc_id").isin(docIds: _*)), tb, ts, bid,
          bands = 8, rowsPerBand = 4, buckets = 2)

      // corpus lands as 1-3 torn-and-replayed batches
      val shuffled = rnd.shuffle(ids)
      val nBatches = 1 + rnd.nextInt(3)
      val cuts = Vector.fill(nBatches - 1)(rnd.nextInt(ids.size + 1))
        .sorted :+ ids.size
      val batches = (0 +: cuts).sliding(2).collect {
        case Seq(a, b) => shuffled.slice(a, b) }.toVector
      for ((b, bid) <- batches.zipWithIndex) {
        if (b.nonEmpty && rnd.nextDouble() < 0.45) {
          val torn = rnd.shuffle(b).take(rnd.nextInt(b.size))
          if (torn.nonEmpty) append(torn, mCorpus, bid.toLong)
        }
        append(b, mCorpus, bid.toLong)
      }
      // poison batch (sometimes torn first, then the WAL replay)
      if (rnd.nextDouble() < 0.5)
        append(Vector(poisonIds(rnd.nextInt(2))), poison, 40L)
      append(poisonIds, poison, 40L)

      // tombstone retraction — sometimes a torn landing (subset under
      // the same batch id), healed by the idempotent replay
      if (rnd.nextDouble() < 0.5)
        Dedup.retractFromCorpusIndex(spark,
          poison.filter(col("doc_id") === poisonIds(rnd.nextInt(2))),
          tb, ts, tt, 50L)
      Dedup.retractFromCorpusIndex(spark, poison, tb, ts, tt, 50L)

      // sometimes purge — with injected mid-swap kills on either table,
      // repairs sometimes prompt, sometimes left for the next entry
      if (rnd.nextDouble() < 0.6) {
        if (rnd.nextDouble() < 0.5) {
          val victim = if (rnd.nextBoolean()) tb else ts
          val key = "doc_id"
          intercept[IllegalStateException] {
            Bucketing.purgeBucketed(spark, victim,
              spark.table(tt).select(col(key)), key,
              injectCrashAtSwapStep = 1 + rnd.nextInt(2))
          }
          if (rnd.nextBoolean()) Bucketing.repairCompaction(spark, victim)
        }
        // the real purge (its own repairCompaction heals any torn swap)
        Dedup.purgeCorpusIndexRetractions(spark, tb, ts, tt)
      }

      withClue(s"seed=$seed: ") {
        // tombstone-gated probe: the gate is a no-op when purged
        val got = Dedup.incrementalVerdictsAgainstIndex(spark, mDelta,
            tb, ts, bands = 8, rowsPerBand = 4,
            tombstonesTable = Some(tt))
          .collect().map(_.toString).toSet
        assert(got === wantProbe,
          "probe after retraction chaos must equal the clean-corpus build")
      }
      Seq(tb, ts, tt).flatMap(t =>
          Seq(t, s"${t}_compacting", s"${t}_precompact"))
        .foreach(Bucketing.dropTable(spark, _))
    }
    Seq(refB, refS).foreach(Bucketing.dropTable(spark, _))
  }

  test("12 seeded lifecycles: purge cadence + replay past purge converge on the clean index") {
    // the round-18 machinery under chaos: two retraction waves, the
    // maybePurge CADENCE (fires only at its pending-batch threshold),
    // replays landing in every window — before purge (idempotent
    // overwrite), inside the purge crash window (tombstone-membership
    // exemption), and AFTER purge (watermark no-op) — plus mid-swap
    // kills. Whatever the schedule, the gated probe must equal the
    // clean build: a watermark bug that swallowed a LIVE batch, or an
    // orphan-guard bug that rejected a legal replay, fails a seed.
    val refB = "chaos_ref2_mh_bands"; val refS = "chaos_ref2_mh_sigs"
    Seq(refB, refS).foreach(Bucketing.dropTable(spark, _))
    Dedup.buildCorpusIndex(mCorpus, refB, refS, bands = 8, rowsPerBand = 4,
      buckets = 2)
    val wantProbe = Dedup.incrementalVerdictsAgainstIndex(spark, mDelta,
      refB, refS, bands = 8, rowsPerBand = 4).collect().map(_.toString).toSet
    val poisonA = mDelta.withColumn("doc_id", col("doc_id") + lit(10000000L))
    val poisonB = mDelta.withColumn("doc_id", col("doc_id") + lit(20000000L))

    for (seed <- 0 until 12) {
      val rnd = new scala.util.Random(8000 + seed)
      val tb = s"chaos_pc_b_s$seed"; val ts = s"chaos_pc_s_s$seed"
      val tt = s"chaos_pc_t_s$seed"
      Seq(tb, ts, tt).flatMap(t =>
          Seq(t, s"${t}_compacting", s"${t}_precompact"))
        .foreach(Bucketing.dropTable(spark, _))
      def append(df: org.apache.spark.sql.DataFrame, bid: Long): Unit =
        Dedup.appendCorpusIndexPartial(spark, df, tb, ts, bid,
          bands = 8, rowsPerBand = 4, buckets = 2)
      append(mCorpus, 0L)
      append(poisonA, 1L)
      append(poisonB, 2L)
      val spec = graft.io.Tombstones.PurgeSpec(tt, "doc_id",
        "minhash-tombs", Seq(tb, ts), everyBatches = 2)

      // wave A retracts; the cadence must HOLD at one pending batch
      Dedup.retractFromCorpusIndex(spark, poisonA, tb, ts, tt, 10L)
      assert(!graft.io.Tombstones.maybePurge(spark, spec),
        s"seed=$seed: cadence fired below its threshold")
      if (rnd.nextDouble() < 0.5) // pre-purge replay: idempotent
        Dedup.retractFromCorpusIndex(spark, poisonA, tb, ts, tt, 10L)
      if (rnd.nextDouble() < 0.4) {
        // the purge crash window: one table rewritten, kill mid-swap on
        // the other, watermark/drop never reached — a replay of wave A
        // must still pass via tombstone membership
        Bucketing.purgeBucketed(spark, tb,
          spark.table(tt).select(col("doc_id")), "doc_id")
        intercept[IllegalStateException] {
          Bucketing.purgeBucketed(spark, ts,
            spark.table(tt).select(col("doc_id")), "doc_id",
            injectCrashAtSwapStep = 1 + rnd.nextInt(2))
        }
        Bucketing.repairCompaction(spark, ts)
        Dedup.retractFromCorpusIndex(spark, poisonA, tb, ts, tt, 10L)
      }

      // wave B retracts; the cadence threshold is now met
      Dedup.retractFromCorpusIndex(spark, poisonB, tb, ts, tt, 11L)
      val purged = graft.io.Tombstones.maybePurge(spark, spec)
      assert(purged, s"seed=$seed: cadence must fire at 2 pending batches")
      assert(!spark.catalog.tableExists(tt), s"seed=$seed: gate not dropped")
      // post-purge replays of BOTH folded waves no-op on the watermark
      if (rnd.nextDouble() < 0.7) {
        Dedup.retractFromCorpusIndex(spark,
          if (rnd.nextBoolean()) poisonA else poisonB, tb, ts, tt,
          if (rnd.nextBoolean()) 10L else 11L)
        assert(!spark.catalog.tableExists(tt),
          s"seed=$seed: a post-purge replay resurrected the tombstone table")
      }
      // the cadence stays armed: nothing pending → no-op
      assert(!graft.io.Tombstones.maybePurge(spark, spec))

      withClue(s"seed=$seed: ") {
        val got = Dedup.incrementalVerdictsAgainstIndex(spark, mDelta,
            tb, ts, bands = 8, rowsPerBand = 4)
          .collect().map(_.toString).toSet
        assert(got === wantProbe,
          "post-cadence-purge probe must equal the clean-corpus build")
      }
      Seq(tb, ts, tt).flatMap(t =>
          Seq(t, s"${t}_compacting", s"${t}_precompact"))
        .foreach(Bucketing.dropTable(spark, _))
    }
    Seq(refB, refS).foreach(Bucketing.dropTable(spark, _))
  }

  test("12 seeded lifecycles: fold cadence + retraction + replay past fold converge on the rebuild-without index") {
    // the round-19 machinery under chaos: random append decompositions
    // with torn commits, the maybeFold CADENCE (fires only at its
    // fresh-batch threshold), fold swaps killed at either failpoint
    // with sometimes-deferred repairs, two retraction waves, and
    // replays landing in every window — before a fold (idempotent
    // partition overwrite) and after one (watermark no-op; without the
    // watermark a replayed retraction would double-negate and a
    // replayed append double-count). Whatever the schedule, the probe
    // must equal the clean rebuild WITHOUT the retired docs, and no
    // cancelled (+df, −df) pair may survive the last fold.
    val refTbl = "chaos_fold_ref"
    Bucketing.dropTable(spark, refTbl)
    val ids = (1L to 20L).toVector
    val waveA = Vector(1L, 5L)
    val waveB = Vector(9L, 13L, 17L)
    val retired = waveA ++ waveB
    Dedup.appendShingleDfPartial(spark,
      corpus.filter(!col("doc_id").isin(retired: _*)), refTbl, 0L,
      buckets = 2)
    val want = Dedup.noveltyIncremental(spark, delta, refTbl)
      .collect().map(_.toString).toSet

    for (seed <- 0 until 12) {
      val rnd = new scala.util.Random(9000 + seed)
      val tbl = s"chaos_fold_s$seed"
      Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
        .foreach(Bucketing.dropTable(spark, _))
      val shuffled = rnd.shuffle(ids)
      val nBatches = 2 + rnd.nextInt(3)
      val cuts = Vector.fill(nBatches - 1)(rnd.nextInt(ids.size + 1))
        .sorted :+ ids.size
      val batches = (0 +: cuts).sliding(2).map {
        case Seq(a, b) => shuffled.slice(a, b) }.toVector
      def append(docIds: Vector[Long], bid: Long): Boolean =
        Dedup.appendShingleDfPartial(spark,
          corpus.filter(col("doc_id").isin(docIds: _*)), tbl, bid,
          buckets = 2)
      def retract(docIds: Vector[Long], bid: Long): Boolean =
        Dedup.retractShingleDfPartial(spark,
          corpus.filter(col("doc_id").isin(docIds: _*)), tbl, bid,
          buckets = 2)
      def maybeChaosFold(): Unit =
        if (rnd.nextDouble() < 0.6) {
          val crashStep = rnd.nextInt(3)
          if (crashStep == 0) Bucketing.maybeFold(spark, tbl, everyBatches = 2)
          else if (Bucketing.isAdditiveIndex(spark, tbl) &&
              spark.sessionState.catalog.listPartitionNames(
                org.apache.spark.sql.catalyst.TableIdentifier(tbl)).size >= 2) {
            intercept[IllegalStateException] {
              Bucketing.foldBucketed(spark, tbl,
                injectCrashAtSwapStep = crashStep)
            }
            if (rnd.nextBoolean()) Bucketing.repairCompaction(spark, tbl)
          }
        }
      // append phase: torn first tries, folds (and fold kills) interleaved
      for ((b, bid) <- batches.zipWithIndex) {
        if (b.nonEmpty && rnd.nextDouble() < 0.45) {
          val torn = rnd.shuffle(b).take(rnd.nextInt(b.size))
          if (torn.nonEmpty) append(torn, bid.toLong) // torn first try
        }
        append(b, bid.toLong)                         // replay heals
        maybeChaosFold()
      }
      // two retraction waves with chaos between and after
      retract(waveA, nBatches.toLong)
      maybeChaosFold()
      retract(waveB, (nBatches + 1).toLong)
      maybeChaosFold()
      // replays of random PAST batches: below the watermark they must
      // no-op; above it they overwrite their own partition — either
      // way the content cannot change
      (0 until 2).foreach { _ =>
        rnd.nextInt(nBatches + 2) match {
          case b if b < nBatches => append(batches(b), b.toLong)
          case b if b == nBatches => retract(waveA, b.toLong)
          case b => retract(waveB, b.toLong)
        }
      }
      // close any deferred repair, then force one final fold so the
      // physical-shrink claim is checkable
      Bucketing.repairCompaction(spark, tbl)
      Bucketing.foldBucketed(spark, tbl)
      withClue(s"seed=${9000 + seed} batches=${batches.map(_.size)}: ") {
        val got = Dedup.noveltyIncremental(spark, delta, tbl)
          .collect().map(_.toString).toSet
        assert(got === want,
          "post-chaos probe must equal the rebuild-without reference")
        assert(spark.table(tbl).count() === spark.table(refTbl).count(),
          "folded index must be row-for-row the rebuild-without")
      }
      Seq(tbl, s"${tbl}_compacting", s"${tbl}_precompact")
        .foreach(Bucketing.dropTable(spark, _))
    }
    Bucketing.dropTable(spark, refTbl)
  }
}
