package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{ImageCodec, VideoCodec}

/** Real-codec binary-column pipeline: PNG round trip, raster-read stats,
  * partition-stream plan shape. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Final (post-AQE) physical plan only — the AdaptiveSparkPlan
    * toString repeats nodes in its Initial Plan section. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }

  test("PNG round trip: decode recovers exactly the generated pixels") {
    val id = 42L
    val (w, h) = ImageCodec.dims(id)
    val img = ImageCodec.decodePng(ImageCodec.encodePng(id))
    assert(img.getWidth === w && img.getHeight === h)
    // every pixel, not just sums: the container really is lossless
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = ImageCodec.pixelRgb(id, x, y)
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) === ((r, g, b)),
        s"pixel ($x,$y) of doc $id corrupted by the codec round trip")
    }
  }

  test("extractImageFeatures: raster-read dims/sums match the generator, no shuffle") {
    val docs = Seq((3L, "x"), (17L, "y")).toDF("doc_id", "text")
    val feats = Multimodal.extractImageFeatures(spark,
      Multimodal.syntheticImages(spark, docs))
    val byId = feats.collect().map(f => f.doc_id -> f).toMap
    for (id <- Seq(3L, 17L)) {
      val (w, h) = ImageCodec.dims(id)
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield ImageCodec.pixelRgb(id, x, y))
        .foldLeft((0L, 0L, 0L)) { case ((a, b, c), (r, g, bl)) =>
          (a + r, b + g, c + bl) }
      val f = byId(id)
      assert((f.width, f.height) === ((w.toLong, h.toLong)))
      assert(f.n_channels === 3L)
      assert((f.sum_r, f.sum_g, f.sum_b) === want)
    }
    // exactly ONE exchange — the bare-id spread BEFORE rendering;
    // payloads themselves never shuffle (encode -> decode -> stats is
    // one narrow stage after it)
    val plan = finalPlan(feats.toDF())
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }

  test("subsample2 keeps even-coordinate pixels at ceil(half) dims") {
    val img = ImageCodec.decodePng(ImageCodec.encodePng(7L))
    val half = ImageCodec.subsample2(img)
    assert(half.getWidth === (img.getWidth + 1) / 2)
    assert(half.getHeight === (img.getHeight + 1) / 2)
    for (y <- 0 until half.getHeight; x <- 0 until half.getWidth)
      assert(half.getRGB(x, y) === img.getRGB(2 * x, 2 * y))
  }

  test("transformImages: resized stats survive the re-encode round trip") {
    val docs = Seq((9L, "z")).toDF("doc_id", "text")
    val t = Multimodal.transformImages(spark,
      Multimodal.syntheticImages(spark, docs)).collect().head
    val (w, h) = ImageCodec.dims(9L)
    assert((t.width, t.height) === ((w.toLong, h.toLong)))
    assert((t.resized_width, t.resized_height) ===
      (((w + 1) / 2).toLong, ((h + 1) / 2).toLong))
    val want = (for (y <- 0 until (h + 1) / 2; x <- 0 until (w + 1) / 2)
      yield ImageCodec.pixelRgb(9L, 2 * x, 2 * y))
      .foldLeft((0L, 0L, 0L)) { case ((a, b, c), (r, g, bl)) =>
        (a + r, b + g, c + bl) }
    assert((t.sum_r, t.sum_g, t.sum_b) === want)
  }

  test("GIF round trip: every frame, every pixel, in order, at every height") {
    // ids 10-14 cover all five frame heights (3-7 px); the h=4 case is
    // what exposed the JDK writer's default interlacing defect
    for (id <- 10L to 14L) {
      val (w, h) = VideoCodec.frameDims(id)
      val reader = VideoCodec.openGif(VideoCodec.encodeGif(id))
      try {
        assert(reader.getNumImages(true) === VideoCodec.nFrames(id))
        for (f <- 0 until VideoCodec.nFrames(id)) {
          val img = reader.read(f)
          assert(img.getWidth === w && img.getHeight === h)
          for (y <- 0 until h; x <- 0 until w)
            assert((img.getRGB(x, y) & 0xff) === VideoCodec.pixelGray(id, f, x, y),
              s"pixel ($x,$y) of frame $f, doc $id corrupted by the GIF round trip")
        }
      } finally reader.dispose()
    }
  }

  test("sampleVideoFrames: stride-2 sampling, generator-exact sums, no shuffle") {
    val docs = Seq((2L, "a"), (11L, "b")).toDF("doc_id", "text")
    val frames = Multimodal.sampleVideoFrames(spark,
      Multimodal.syntheticVideos(spark, docs))
    val got = frames.collect().groupBy(_.doc_id)
    for (id <- Seq(2L, 11L)) {
      val n = VideoCodec.nFrames(id)
      val (w, h) = VideoCodec.frameDims(id)
      val rows = got(id).sortBy(_.frame_idx)
      assert(rows.map(_.frame_idx).toSeq === (0 until n by 2).map(_.toLong))
      for (r <- rows) {
        assert((r.n_frames, r.width, r.height) === ((n.toLong, w.toLong, h.toLong)))
        val want = (for (y <- 0 until h; x <- 0 until w)
          yield VideoCodec.pixelGray(id, r.frame_idx.toInt, x, y).toLong).sum
        assert(r.sum_gray === want)
      }
    }
    // one id-spread exchange pre-encode; payloads never shuffle
    val plan = finalPlan(frames.toDF())
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }

  test("imageAHash: exact-integer replay of luma, sampling, mean, bits") {
    val docs = Seq((3L, "a"), (94L, "b")).toDF("doc_id", "text")
    val got = Multimodal.imageAHash(spark,
      Multimodal.syntheticImages(spark, docs)).collect()
      .map(h => h.doc_id -> ((h.ahash_lo, h.ahash_hi))).toMap
    for (id <- Seq(3L, 94L)) {
      val (w, h) = ImageCodec.dims(id)
      val g = for (j <- 0 until 8; i <- 0 until 8) yield {
        val (r, gg, b) = ImageCodec.pixelRgb(id, i * w / 8, j * h / 8)
        (r * 299L + gg * 587L + b * 114L) / 1000L
      }
      val mean = g.sum / 64L
      var (lo, hi) = (0L, 0L)
      for (k <- 0 until 64 if g(k) > mean)
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      assert(got(id) === ((lo, hi)), s"doc $id ahash mismatch")
    }
  }

  test("imageNearDupPairs: banded candidates equal the brute-force pairs") {
    // ids spanning several dim classes, including the 91-apart
    // constant-shift near-dups the generator plants
    val ids = (Seq(3L, 94L, 185L) ++ (10L to 30L)).distinct
    val docs = ids.map(i => (i, "x")).toDF("doc_id", "text")
    val hashes = Multimodal.imageAHash(spark,
      Multimodal.syntheticImages(spark, docs)).toDF()
    val got = Multimodal.imageNearDupPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hs = hashes.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = (for {
      a <- ids; b <- ids if a < b
      d = java.lang.Long.bitCount(hs(a)._1 ^ hs(b)._1) +
        java.lang.Long.bitCount(hs(a)._2 ^ hs(b)._2)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got === want, "banding must find exactly the brute-force pairs")
    assert(want.exists(p => p._1 == 3L && p._2 == 94L),
      "the planted 91-apart near-dup must surface")
    // the distinct-signature scale path reconciles exactly with the
    // doc-level pairs: cross-signature multiplicities plus the exact
    // (hamming-0, same-signature) groups account for every pair
    val distinctRows = Multimodal.imageNearDupDistinctPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sigCounts = hs.values.groupBy(identity).view.mapValues(_.size.toLong)
    val withinGroupPairs = sigCounts.values.map(n => n * (n - 1) / 2).sum
    val crossPairs = distinctRows.map(_._4).sum
    assert(crossPairs + withinGroupPairs === want.size.toLong,
      "distinct-pair multiplicities + exact groups must cover all pairs")
    // distinct rows carry representative ids and positive multiplicities
    assert(distinctRows.forall(r => r._4 >= 1 && r._1 < r._2))
  }

  test("variant GIF round trip: decode recovers exactly the variant pixels") {
    for (id <- Seq(6L, 7L)) { // one even/odd planted pair
      val (w, h) = VideoCodec.variantDims(id / 2)
      val reader = VideoCodec.openGif(VideoCodec.encodeVariantGif(id))
      try {
        assert(reader.getNumImages(true) === VideoCodec.fpFrames)
        for (f <- 0 until VideoCodec.fpFrames) {
          val img = reader.read(f)
          assert(img.getWidth === w && img.getHeight === h)
          for (y <- 0 until h; x <- 0 until w)
            assert((img.getRGB(x, y) & 0xff) === VideoCodec.variantGray(id, f, x, y),
              s"pixel ($x,$y) of frame $f, doc $id corrupted by the round trip")
        }
      } finally reader.dispose()
    }
  }

  /** Plain-Scala fingerprint replay from the generator (no codec). */
  private def vfpWant(id: Long): (Long, Long) = {
    val (w, h) = VideoCodec.variantDims(id / 2)
    val s = Array.tabulate(VideoCodec.fpFrames) { f =>
      (for (y <- 0 until h; x <- 0 until w)
        yield VideoCodec.variantGray(id, f, x, y).toLong).sum
    }
    var (lo, hi) = (0L, 0L)
    for (f <- 0 until 64 if s(f + 1) > s(f))
      if (f < 32) lo |= 1L << f else hi |= 1L << (f - 32)
    (lo, hi)
  }

  test("videoFingerprints: generator-exact bits; planted pair flips only bits 0-2") {
    val ids = Seq(6L, 7L, 20L, 21L)
    val docs = ids.map(i => (i, "x")).toDF("doc_id", "text")
    val fps = Multimodal.videoFingerprints(spark,
      Multimodal.syntheticVideoVariants(spark, docs))
    val got = fps.collect().map(f => f.doc_id -> ((f.fp_lo, f.fp_hi))).toMap
    for (id <- ids) assert(got(id) === vfpWant(id), s"doc $id fingerprint mismatch")
    for (Seq(e, o) <- Seq(Seq(6L, 7L), Seq(20L, 21L))) {
      val d = java.lang.Long.bitCount(got(e)._1 ^ got(o)._1) +
        java.lang.Long.bitCount(got(e)._2 ^ got(o)._2)
      assert(d <= 3, s"planted pair ($e,$o) at hamming $d > 3")
      // the perturbation touches frames 0-2 only, so bits >= 3 agree
      assert((got(e)._1 >> 3) === (got(o)._1 >> 3) && got(e)._2 === got(o)._2,
        s"planted pair ($e,$o) differs beyond bit 2")
    }
    // one id-spread exchange pre-encode; payloads never shuffle
    val plan = finalPlan(fps.toDF())
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }

  test("videoNearDupPairs: banded candidates equal the brute-force pairs") {
    val ids = (0L to 41L).toSeq // 21 planted even/odd pairs
    val docs = ids.map(i => (i, "x")).toDF("doc_id", "text")
    val fps = Multimodal.videoFingerprints(spark,
      Multimodal.syntheticVideoVariants(spark, docs)).toDF()
    val hs = fps.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = (for {
      a <- ids; b <- ids if a < b
      d = java.lang.Long.bitCount(hs(a)._1 ^ hs(b)._1) +
        java.lang.Long.bitCount(hs(a)._2 ^ hs(b)._2)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.videoNearDupPairs(fps).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want, "banding must find exactly the brute-force pairs")
    // every planted even/odd pair is in the edge set
    for (g <- 0L to 20L)
      assert(got.exists(p => p._1 == 2 * g && p._2 == 2 * g + 1),
        s"planted pair (${2 * g},${2 * g + 1}) missing from the banded edges")
  }
}
