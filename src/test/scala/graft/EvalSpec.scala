package graft

import graft.queries.EvalQueries
import org.apache.spark.sql.functions._

/** Dataset-evaluation rows (p103–p109): split hygiene, semantic
  * decontamination, calibrated gating, drift, syndication, novelty,
  * and the packed-shard manifest. Each test pins the property the
  * DuckDB hash oracle alone can't express as a CONTRACT (the oracle
  * certifies value equality; these certify the semantics the values
  * are supposed to have). */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------
  // p103 — group-aware split
  // ------------------------------------------------------------------

  test("p103: a dedup group NEVER spans folds under the group split") {
    val out = EvalQueries.groupAwareSplit(spark, sfDir)
    val spanning = out.groupBy(col("group_id"))
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1)
    assert(spanning.isEmpty, "group split leaked a dedup group across folds")
  }

  test("p103: the leak audit discriminates — the naive split DOES leak groups") {
    val out = EvalQueries.groupAwareSplit(spark, sfDir)
    val naiveSpanning = out.groupBy(col("group_id"))
      .agg(countDistinct(col("naive_split")).as("k"))
      .filter(col("k") > 1).count()
    assert(naiveSpanning >= 1,
      "fixture has no naive-split leakage — the audit column is vacuous")
    // the flag marks exactly the docs of naive-spanning groups
    val flagged = out.filter(col("group_naive_leaky")).select("group_id").distinct().count()
    assert(flagged === naiveSpanning)
    // singleton groups can never be leaky
    val singletons = out.groupBy(col("group_id")).agg(count(lit(1)).as("n"),
        max(col("group_naive_leaky").cast("int")).as("lk"))
      .filter(col("n") === 1 && col("lk") === 1)
    assert(singletons.isEmpty, "a singleton group was marked leaky")
  }

  test("p103: group fold = the keeper's own naive fold (content-keyed inheritance)") {
    val out = EvalQueries.groupAwareSplit(spark, sfDir)
    val keepers = out.filter(col("doc_id") === col("group_id"))
    assert(keepers.filter(col("split") =!= col("naive_split")).isEmpty,
      "the keeper's group fold must equal its own content-keyed fold")
  }

  // ------------------------------------------------------------------
  // p104 — semantic decontamination
  // ------------------------------------------------------------------

  test("p104: planted exact benchmark copy is flagged with cos 1.0") {
    // vec 20 IS benchmark (20 % 20 == 0); vec 21 is its exact copy in
    // the corpus; vec 23 is orthogonal
    val emb = Seq(
      (20L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (21L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (23L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    // the PRODUCTION core, not a re-implementation — a regression in
    // the row's threshold/rounding/tie-break must fail here
    val got = EvalQueries.semanticDecontaminationCore(emb)
      .select(col("vec_id"), col("cos_sim"), col("is_contaminated"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(got === Set((21L, 1.0, true), (23L, 0.0, false)))
  }

  test("p104: every flagged vector's nearest benchmark is in the probe set; flags match the threshold") {
    val out = EvalQueries.semanticDecontamination(spark, sfDir)
    assert(out.filter(col("bench_id") % 20 =!= 0).isEmpty)
    assert(out.filter(col("is_contaminated") =!= (col("cos_sim") >= 0.35)).isEmpty)
    assert(out.filter(col("vec_id") % 20 === 0).isEmpty,
      "benchmark vectors must not be scored as corpus")
  }

  // ------------------------------------------------------------------
  // p105 — calibrated quality gate
  // ------------------------------------------------------------------

  test("p105: buckets are monotone in score and the gate drops exactly bucket 1") {
    val out = EvalQueries.calibratedQualityGate(spark, sfDir)
    // monotone: no doc in a lower bucket may out-score a doc in a higher
    val bounds = out.groupBy(col("bucket"))
      .agg(min(col("score6")).as("lo"), max(col("score6")).as("hi"))
      .orderBy(col("bucket")).collect()
    bounds.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0).getLong(2) <= w(1).getLong(1),
          s"bucket ${w(0).getInt(0)} max exceeds bucket ${w(1).getInt(0)} min")
    }
    assert(out.filter(col("keep") =!= (col("bucket") >= 2)).isEmpty)
    assert(out.select("bucket").distinct().count() === 5,
      "fixture scores must populate all five buckets")
  }

  test("p105: cut points are the sample's exact type-1 quintiles") {
    val docs = Tables.documents(spark, sfDir)
    val sc = graft.ops.TextAnalysis.unigramLogProb(docs)
      .select(col("doc_id"), round(col("avg_logprob") * 1e6, 0).cast("long").as("score6"))
    val smp = sc.join(docs.select(col("doc_id"),
        graft.ops.Sampling.hashBucket(col("text")).as("b")), Seq("doc_id"))
      .filter(col("b") < 10)
      .select("score6", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val n = smp.length
    def cut(k: Int): Long = smp(((k.toLong * n + 4) / 5 - 1).toInt)._1
    val out = EvalQueries.calibratedQualityGate(spark, sfDir)
    // replay bucketing with the driver-computed cuts: identical verdicts
    val expected = sc.collect().map { r =>
      val s = r.getLong(1)
      val b = 1 + Seq(cut(1), cut(2), cut(3), cut(4)).count(s > _)
      (r.getLong(0), b)
    }.toMap
    val got = out.select("doc_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got === expected)
  }

  // ------------------------------------------------------------------
  // p106 — pack manifest
  // ------------------------------------------------------------------

  test("p106: manifest accounts for every doc; fill respects capacity; seq ids contiguous") {
    val out = EvalQueries.packManifest(spark, sfDir).persist()
    val docsN = Tables.documents(spark, sfDir).count()
    assert(out.agg(sum(col("n_docs"))).head.getLong(0) === docsN)
    // a multi-doc sequence never exceeds capacity (single oversized docs may)
    assert(out.filter(col("n_docs") > 1 && col("n_tokens") > 1024).isEmpty)
    assert(out.filter(col("fill6") =!= expr("n_tokens * 1000000 div 1024")).isEmpty)
    // per shard: sequence ids are 0..max with no gaps
    val bad = out.groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n"), max(col("seq_id")).as("mx"), min(col("seq_id")).as("mn"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.isEmpty, "sequence ids must be contiguous from 0 per shard")
    out.unpersist()
  }

  test("p106: piece counts feeding the packer equal the p80 encoder's") {
    val docs = Tables.documents(spark, sfDir)
    val merges = graft.ops.TextAnalysis.bpeLearnMerges(docs, 10)
    val pieces = graft.ops.TextAnalysis.bpeEncode(docs, merges)
      .agg(sum(col("n_pieces"))).head.getLong(0)
    val manifest = EvalQueries.packManifest(spark, sfDir)
      .agg(sum(col("n_tokens"))).head.getLong(0)
    assert(manifest === pieces,
      "manifest token total must equal the encoder's piece total")
  }

  // ------------------------------------------------------------------
  // p107 — embedding drift
  // ------------------------------------------------------------------

  test("p107: occupancy is conserved and drift is the exact share difference") {
    val out = EvalQueries.embeddingDrift(spark, sfDir).persist()
    val embN = Tables.embeddings(spark, sfDir).count()
    assert(out.agg(sum(col("n_old") + col("n_new"))).head.getLong(0) === embN)
    assert(out.count() <= 8)
    assert(out.filter(col("drift6") =!=
      abs(col("share_new6") - col("share_old6"))).isEmpty)
    // truncating shares: each wave's shares sum to 1e6 minus at most k-1
    val sums = out.agg(sum(col("share_old6")).as("so"), sum(col("share_new6")).as("sn")).head
    assert(sums.getLong(0) > 1000000L - 8 && sums.getLong(0) <= 1000000L)
    assert(sums.getLong(1) > 1000000L - 8 && sums.getLong(1) <= 1000000L)
    out.unpersist()
  }

  // ------------------------------------------------------------------
  // p108 — syndication matrix
  // ------------------------------------------------------------------

  test("p108: matrix totals equal the verified pair count; cells are normalized") {
    val docs = Tables.documents(spark, sfDir)
    val nPairs = graft.ops.Dedup.minhashLsh(docs, bands = 16, rowsPerBand = 8,
      shingleN = 3, threshold = 0.7).count()
    val out = EvalQueries.syndicationMatrix(spark, sfDir).persist()
    assert(out.agg(sum(col("n_pairs"))).head.getLong(0) === nPairs)
    assert(out.filter(col("source_a") > col("source_b")).isEmpty,
      "matrix cells must be normalized (source_a <= source_b)")
    assert(out.filter(col("example_left") >= col("example_right")).isEmpty,
      "example pair must keep the left_id < right_id orientation")
    out.unpersist()
  }

  // ------------------------------------------------------------------
  // p109 — n-gram novelty
  // ------------------------------------------------------------------

  test("p109: planted duplicate has zero novelty, unique doc full novelty") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact copy: every shingle shared
      (3L, "zeta eta theta iota kappa")       // fully unique shingles
    ).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
        explode(graft.ops.Dedup.shingles(col("text"), 3)).as("g"))
      .select(col("doc_id"), md5(col("g")).as("h"))
    val df = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val got = sh.join(df, Seq("h")).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("u"))
      .select(col("doc_id"), expr("u * 1000000 div n").as("novelty6"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) === 0L && got(2L) === 0L && got(3L) === 1000000L)
  }

  // ------------------------------------------------------------------
  // p114 — per-source calibrated gate
  // ------------------------------------------------------------------

  test("p114: stratification matters, fallback fires, buckets monotone within source") {
    val out = EvalQueries.sourceCalibratedGate(spark, sfDir).persist()
    val global = EvalQueries.calibratedQualityGate(spark, sfDir)
      .select(col("doc_id"), col("bucket").as("gbucket"))
    // per-source bars must actually move verdicts vs the global bar
    assert(out.join(global, Seq("doc_id"))
      .filter(col("bucket") =!= col("gbucket")).count() >= 1,
      "per-source calibration changed nothing — stratification is vacuous here")
    // fallback semantics: calibrated == false iff the source has no
    // sampled docs; those docs must carry the GLOBAL verdict exactly
    val sampledSources = Tables.documents(spark, sfDir)
      .filter(graft.ops.Sampling.hashBucket(col("text")) < 10)
      .select(col("source")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(out.filter(col("calibrated") =!=
      col("source").isin(sampledSources.toSeq: _*)).isEmpty,
      "calibrated flag must mark exactly the sampled sources")
    assert(out.filter(!col("calibrated")).join(global, Seq("doc_id"))
      .filter(col("bucket") =!= col("gbucket")).isEmpty,
      "uncalibrated sources must fall back to the global cuts verbatim")
    // monotone in score WITHIN each calibrated source
    val bounds = out.filter(col("calibrated"))
      .groupBy(col("source"), col("bucket"))
      .agg(min(col("score6")).as("lo"), max(col("score6")).as("hi"))
    val bad = bounds.as("a").join(bounds.as("b"),
        col("a.source") === col("b.source") && col("a.bucket") < col("b.bucket"))
      .filter(col("a.hi") > col("b.lo"))
    assert(bad.isEmpty, "bucket bounds must be monotone in score within a source")
    out.unpersist()
  }

  // ------------------------------------------------------------------
  // p115 — pack-boundary span manifest
  // ------------------------------------------------------------------

  test("p115: spans tile each sequence exactly — contiguous, disjoint, length-true") {
    val out = EvalQueries.packBoundaries(spark, sfDir).persist()
    // span length = the doc's BPE piece count
    val docs = Tables.documents(spark, sfDir)
    val merges = graft.ops.TextAnalysis.bpeLearnMerges(docs, 10)
    val pieces = graft.ops.TextAnalysis.bpeEncode(docs, merges)
      .select(col("doc_id"), col("n_pieces"))
    assert(out.join(pieces, Seq("doc_id"))
      .filter(col("tok_end") - col("tok_start") + 1 =!= col("n_pieces")).isEmpty,
      "span length must equal the encoder's piece count")
    // within a sequence: ordered by doc_id, each span begins where the
    // previous ended + 1, and the first begins at 0 (next-fit order)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("bucket"), col("seq_id"))
      .orderBy(col("doc_id"))
    val tiled = out.withColumn("prev_end", lag(col("tok_end"), 1, -1L).over(w))
    assert(tiled.filter(col("tok_start") =!= col("prev_end") + 1).isEmpty,
      "spans must tile the sequence with no gaps or overlaps")
    // agreement with p106: same doc membership per sequence
    val manifest = EvalQueries.packManifest(spark, sfDir)
      .select(col("source"), col("bucket"), col("seq_id"), col("n_docs"))
    val counted = out.groupBy(col("source"), col("bucket"), col("seq_id"))
      .agg(count(lit(1)).as("got"))
    assert(counted.join(manifest, Seq("source", "bucket", "seq_id"))
      .filter(col("got") =!= col("n_docs")).isEmpty,
      "boundary rows per sequence must match the p106 manifest")
    out.unpersist()
  }

  // ------------------------------------------------------------------
  // p111 — tokenizer merge-table drift
  // ------------------------------------------------------------------

  test("p111: self-comparison is the identity (every rank agrees, rank_a_in_b = rank)") {
    val docs = Tables.documents(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occurrences").desc, col("pair").asc)
    val r = graft.ops.TextAnalysis.bpePairStats(docs, k = 10)
      .withColumn("rank", row_number().over(w).cast("long"))
    val a = r.select(col("rank"), col("pair").as("pair_a"), col("n_occurrences").as("n_a"))
    val b = r.select(col("rank"), col("pair").as("pair_b"), col("n_occurrences").as("n_b"))
    val inB = r.select(col("pair").as("pair_a"), col("rank").as("rank_a_in_b"))
    val self = a.join(b, Seq("rank")).join(inB, Seq("pair_a"), "left")
    assert(self.filter(col("pair_a") =!= col("pair_b") ||
      col("rank_a_in_b") =!= col("rank")).isEmpty,
      "the drift device must report zero drift when both waves are the same corpus")
  }

  test("p111: fixture waves genuinely drift; dropped pairs report rank 0") {
    val out = EvalQueries.tokenizerDrift(spark, sfDir).persist()
    assert(out.count() === 10)
    assert(out.filter(!col("same_pair")).count() >= 1,
      "fixture waves must disagree somewhere or the audit is vacuous")
    // a pair_a absent from wave B's top-10 must report 0, and a present
    // one must report its true wave-B rank (cross-checked via pair_b)
    val viaB = out.select(col("pair_b").as("pair_a"), col("rank").as("want"))
    val cross = out.join(viaB, Seq("pair_a"), "left")
      .filter(coalesce(col("want"), lit(0L)) =!= col("rank_a_in_b"))
    assert(cross.isEmpty, "rank_a_in_b must equal pair_a's actual wave-B rank (0 if absent)")
    out.unpersist()
  }

  test("p109: bounds hold and both novel and non-novel docs exist on the fixture") {
    val out = EvalQueries.ngramNovelty(spark, sfDir).persist()
    assert(out.filter(col("n_unique") > col("n_shingles")).isEmpty)
    assert(out.filter(col("novelty6") < 0 || col("novelty6") > 1000000L).isEmpty)
    assert(out.filter(col("is_novel")).count() >= 1)
    assert(out.filter(!col("is_novel")).count() >= 1,
      "fixture must exercise both sides of the novelty gate")
    out.unpersist()
  }
}
