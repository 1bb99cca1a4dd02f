package graft

import graft.ops.{Clustering, Packing, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantics of the curation family: repetition metrics, boilerplate
  * gate, sequence packing, k-means step. */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("repetition stats: bigram counts conserve and flag repeated text") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "spam spam spam spam spam spam")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // a doc with n tokens has n-1 bigrams
    assert(out(1L).getAs[Long]("n_ngrams") === 5L)
    assert(out(2L).getAs[Long]("n_ngrams") === 5L)
    // pure repetition: every bigram is "spam spam"
    assert(out(2L).getAs[Double]("top_ngram_frac") === 1.0)
    assert(out(2L).getAs[Double]("dup_ngram_frac") === 1.0)
    // no repeated bigram in doc 1
    assert(out(1L).getAs[Double]("dup_ngram_frac") === 0.0)
  }

  test("boilerplate gate: keep implies every individual rule") {
    val out = TextAnalysis.boilerplateFlags(Tables.documents(spark, sfDir))
    val bad = out.filter(col("keep") &&
      (!col("has_stopword") || col("type_token_ratio") < 0.3 ||
        !col("n_tokens").between(20, 10000)))
    assert(bad.isEmpty)
    // the gate must actually discriminate on this corpus
    val kinds = out.select(col("keep")).distinct().count()
    assert(kinds === 2, "expected both kept and dropped documents")
  }

  test("packing: every doc placed once, bins respect capacity") {
    val docs = Tables.documents(spark, sfDir)
    val out = Packing.packSequences(docs, capacity = 512, shards = 8).cache()
    assert(out.count() === docs.count(), "placement is a bijection")
    assert(out.select("doc_id").distinct().count() === docs.count())
    // within a bin, docs tile contiguously: sum of lengths = max(end)
    val bins = out.groupBy(col("source"), col("bucket"), col("seq_id"))
      .agg(sum(col("n_tokens")).as("toks"),
        max(col("tok_offset") + col("n_tokens")).as("hi"),
        min(col("tok_offset")).as("lo"),
        count(lit(1)).as("n_docs"))
    assert(bins.filter(col("lo") =!= 0 || col("hi") =!= col("toks")).isEmpty,
      "bins must tile from offset 0 with no gaps or overlaps")
    // multi-doc bins never exceed capacity (single oversized docs may)
    assert(bins.filter(col("n_docs") > 1 && col("toks") > 512).isEmpty)
    out.unpersist()
  }

  test("domain mix: downsampled sources keep fewer, others keep all") {
    val out = graft.queries.CurationQueries.domainMix(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // unlisted sources keep everything
    out.filterNot(kv => Set("src0", "src1", "src2")(kv._1)).values.foreach { r =>
      assert(r.getAs[Long]("n_kept") === r.getAs[Long]("n_docs"))
    }
    // listed sources never keep more than everything, and the three
    // rates order their keep fractions (10 <= 25 <= 50 in expectation;
    // assert only the hard invariant, not the statistical one)
    Seq("src0", "src1", "src2").foreach { s =>
      assert(out(s).getAs[Long]("n_kept") <= out(s).getAs[Long]("n_docs"))
    }
  }

  test("grouping sets: per-set totals agree with the global total") {
    val rows = graft.queries.CurationQueries.groupingSets(spark, sfDir).collect()
    val global = rows.filter(r =>
      r.getAs[Long]("g_priority") == 1L && r.getAs[Long]("g_status") == 1L)
    assert(global.length === 1)
    val byPriority = rows.filter(r => r.getAs[Long]("g_priority") == 0L)
      .map(_.getAs[Long]("n_orders")).sum
    val byStatus = rows.filter(r => r.getAs[Long]("g_status") == 0L)
      .map(_.getAs[Long]("n_orders")).sum
    val total = global(0).getAs[Long]("n_orders")
    assert(byPriority === total && byStatus === total,
      "each grouping set partitions the same row universe")
  }

  test("kmeans step: partition of the corpus into at most k cells") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = Clustering.kmeansStep(emb, k = 8).cache()
    assert(out.count() <= 8)
    val members = out.agg(sum(col("n_members"))).collect()(0).getLong(0)
    assert(members === emb.count(), "every vector lands in exactly one cell")
    assert(out.filter(col("mean_cos") > 1.000001 || col("mean_cos") < -1.000001).isEmpty)
    out.unpersist()
  }

  test("semantic dedup: keep-first within cells, dup evidence consistent") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = Clustering.semanticDedup(emb).cache()
    assert(out.count() === emb.count(), "one verdict per vector, always")
    // duplicates point at a LOWER-id vector in the SAME cell above threshold
    val dups = out.filter(col("is_dup"))
    assert(dups.filter(col("dup_of") >= col("vec_id")).isEmpty)
    assert(dups.filter(col("dup_cos") < 0.45).isEmpty)
    val cellOf = out.select(col("vec_id").as("dup_of"), col("cell").as("dup_cell"))
    assert(dups.join(cellOf, "dup_of")
      .filter(col("cell") =!= col("dup_cell")).isEmpty,
      "dedup must be cluster-scoped: evidence pair shares the cell")
    // non-duplicates carry no evidence
    assert(out.filter(!col("is_dup") && col("dup_of").isNotNull).isEmpty)
    out.unpersist()
  }

  test("semantic dedup derives k from corpus size; cell sizes stay bounded") {
    // realistic geometry: the sf0.01 corpus (500 vectors incl. near-dup
    // families). targetCellSize=32 must derive k = ceil(500/32) = 16,
    // and data-sampled centroids keep the worst cell within a small
    // multiple of the target (pinned on the fixed corpus).
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val out = Clustering.semanticDedup(emb, targetCellSize = 32).cache()
    assert(out.count() === 500)
    val cells = out.groupBy(col("cell")).count().cache()
    assert(cells.count() <= 16, "at most k = ceil(n/target) cells")
    val maxCell = cells.agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxCell <= 4L * 32,
      s"max cell $maxCell must stay within 4x the target size")
    cells.unpersist(); out.unpersist()
  }

  test("lloyd converges on the fixture and reports consistent cells") {
    val emb = Tables.embeddings(spark, sfDir)
    val (report, rounds) = Clustering.lloydConverged(emb, k = 4,
      maxRounds = 30, eps = 5e-3)
    val rows = report.cache()
    assert(rounds < 30, "cohesion improvement must fall below eps before cap")
    assert(rows.count() <= 4)
    val members = rows.agg(sum(col("n_members"))).collect()(0).getLong(0)
    assert(members === emb.count(), "every vector lands in exactly one cell")
    assert(rows.filter(col("mean_cos") > 1.000001 || col("mean_cos") < -1.000001).isEmpty)
    rows.unpersist()
  }

  test("lloydReport round 2 equals round 1 composed with one refinement") {
    // rounds=1 must equal the single hash-sampled-seed assignment stats;
    // rounds=2 must differ only via the learned centroids (cells keyed by
    // the same seed ids). Sanity-pins the loop plumbing.
    val emb = Tables.embeddings(spark, sfDir)
    val r1 = Clustering.lloydReport(emb, k = 4, rounds = 1)
    val r2 = Clustering.lloydReport(emb, k = 4, rounds = 2)
    val m1 = r1.agg(sum(col("n_members"))).collect()(0).getLong(0)
    val m2 = r2.agg(sum(col("n_members"))).collect()(0).getLong(0)
    assert(m1 === emb.count() && m2 === emb.count())
    // cell ids in round 2 are a subset of round 1's seed-derived ids
    val ids1 = r1.select("cell").collect().map(_.getLong(0)).toSet
    val ids2 = r2.select("cell").collect().map(_.getLong(0)).toSet
    assert(ids2.subsetOf(ids1))
  }

  test("centroidOutliers flags vectors opposing the corpus mean") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(-1.0f, 0.0f))) // opposes the (1/3, 0) centroid
      .toDF("vec_id", "embedding")
    val got = Clustering.centroidOutliers(emb, threshold = -0.15)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("centroid_cos"), r.getAs[Boolean]("is_outlier")))).toMap
    assert(got(0L) === ((1.0, false)))
    assert(got(1L) === ((1.0, false)))
    assert(got(2L) === ((-1.0, true)))
  }
}
