package graft

import graft.ops.{Quantize, Sampling}
import org.apache.spark.sql.functions._

class QuantizeSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("quantization reconstruction error is bounded by scale/2 per element") {
    val report = Quantize.qualityReport(Tables.embeddings(spark, sfDir))
    val rows = report.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val maxErr = r.getAs[Double]("max_abs_err")
      assert(maxErr <= scale / 2 + 1e-12,
        s"vec ${r.getAs[Long]("vec_id")}: max_abs_err $maxErr > scale/2 ${scale / 2}")
    }
  }

  test("quantize/dequantize round-trips exact int8-representable values") {
    val df = Seq((1L, Array(1.27f, -1.27f, 0.0f, 0.635f))).toDF("vec_id", "embedding")
    val out = df.withColumn("scale", Quantize.scaleOf(col("embedding")))
      .withColumn("codes", Quantize.quantize(col("embedding"), col("scale")))
      .select(col("codes")).as[Seq[Byte]].head()
    assert(out === Seq[Byte](127, -127, 0, 64)) // 0.635/0.01 = 63.5 -> 64 (half up)
  }

  test("zero vectors quantize to zero codes with zero error, not NULLs") {
    val df = Seq((1L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Quantize.qualityReport(df).collect().head
    assert(r.getAs[Double]("scale") === 0.0)
    assert(r.getAs[Double]("mse") === 0.0)
    assert(r.getAs[Double]("max_abs_err") === 0.0)
  }

  test("train/test split is deterministic and ~80/20") {
    val docs = Tables.documents(spark, sfDir)
    val s1 = Sampling.trainTestSplit(docs, col("text")).select("doc_id", "split")
    val s2 = Sampling.trainTestSplit(docs, col("text")).select("doc_id", "split")
    assert(s1.exceptAll(s2).isEmpty) // stable across runs
    val frac = s1.filter(col("split") === "train").count().toDouble / s1.count()
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("deterministic sample is a subset invariant under repartition") {
    val docs = Tables.documents(spark, sfDir)
    val a = Sampling.deterministicSample(docs, col("text"), 30).select("doc_id")
    val b = Sampling.deterministicSample(docs.repartition(7), col("text"), 30).select("doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("stratified sample honors per-stratum fractions deterministically") {
    import spark.implicits._
    val df = (0 until 400).map(i => (i.toLong, if (i % 2 == 0) "en" else "es", s"doc $i"))
      .toDF("id", "lang", "text")
    val kept = Sampling.stratifiedSample(df, col("lang"), col("text"),
      Map("en" -> 0), defaultPct = 100)
    // en fully dropped, es fully kept
    assert(kept.filter(col("lang") === "en").count() === 0L)
    assert(kept.filter(col("lang") === "es").count() === 200L)
    val half = Sampling.stratifiedSample(df, col("lang"), col("text"),
      Map("en" -> 50), defaultPct = 100)
    val enFrac = half.filter(col("lang") === "en").count().toDouble / 200.0
    assert(enFrac > 0.35 && enFrac < 0.65, s"en fraction $enFrac")
    // rerun identical
    val again = Sampling.stratifiedSample(df, col("lang"), col("text"),
      Map("en" -> 50), defaultPct = 100).select("id")
    assert(half.select("id").exceptAll(again).isEmpty)
  }

  test("quality-weighted sample: score is the keep probability, rerun-stable") {
    import spark.implicits._
    val df = (1 to 400).map(i => (i.toLong, s"document number $i content", i % 2))
      .toDF("id", "text", "parity")
      // score 0.0 for even ids, 1.0 for odd: keeps must be exactly the odds
      .withColumn("score", col("parity").cast("double"))
    val out = Sampling.qualityWeightedSample(df, col("text"), col("score"))
    assert(out.filter(col("is_kept") && col("parity") === 0).count() === 0L)
    assert(out.filter(!col("is_kept") && col("parity") === 1).count() === 0L)
    // bucket range and rerun stability
    assert(out.filter(col("bucket") < 0 || col("bucket") >= 10000).count() === 0L)
    val again = Sampling.qualityWeightedSample(df, col("text"), col("score"))
      .filter(col("is_kept")).select("id")
    assert(out.filter(col("is_kept")).select("id").exceptAll(again).isEmpty)
  }

  test("temperatureAllocation: exact budget sum, sqrt flattening, largest remainder") {
    import spark.implicits._
    // domain sizes 1 : 4 : 16 — proportional shares 1/21, 4/21, 16/21;
    // sqrt-flattened weights ∝ 1 : 2 : 4 (small domains up-weighted)
    val docs = (Seq.fill(1)("a") ++ Seq.fill(4)("b") ++ Seq.fill(16)("c"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s, "tok tok tok") }
      .toDF("doc_id", "source", "text")
    val got = Sampling.temperatureAllocation(docs, col("source"),
        org.apache.spark.sql.functions.size(
          graft.ops.TextAnalysis.tokens(col("text"))), budget = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.values.map(_._3).sum === 1000L, "allocations must sum to the budget")
    assert(got("a")._1 === 3L && got("b")._1 === 12L && got("c")._1 === 48L)
    // sqrt flattening: c has 16x a's tokens but only ~4x its allocation
    val (aAlloc, cAlloc) = (got("a")._3, got("c")._3)
    assert(cAlloc < 5 * aAlloc && cAlloc > 3 * aAlloc,
      s"sqrt temperature must flatten 16:1 shares toward 4:1, got $got")
    // rerun stability (no RNG anywhere)
    val again = Sampling.temperatureAllocation(docs, col("source"),
        org.apache.spark.sql.functions.size(
          graft.ops.TextAnalysis.tokens(col("text"))), budget = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(again === got.view.mapValues(_._3).toMap)
  }
}
