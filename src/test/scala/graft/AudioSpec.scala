package graft

import graft.ops.Audio
import graft.ops.Audio.AudioCodec

/** Real-codec audio pipeline: WAV round trip, decoded-stream stats,
  * partition-stream plan shape — the audio sibling of MultimodalSpec. */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  /** Final (post-AQE) physical plan only — the AdaptiveSparkPlan
    * toString repeats nodes in its Initial Plan section. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }

  test("WAV round trip: decode recovers exactly the generated samples") {
    for (id <- Seq(0L, 5L, 42L)) {
      val n = AudioCodec.nSamples(id)
      val rate = AudioCodec.sampleRate(id)
      val want = Array.tabulate(n)(AudioCodec.sample(id, _))
      val (gotRate, got) = AudioCodec.decodeWav(AudioCodec.encodeWav(want, rate))
      assert(gotRate === rate)
      assert(got.length === n)
      // every sample, not just aggregates: the container really is lossless
      assert(got.toSeq === want.toSeq,
        s"doc $id waveform corrupted by the codec round trip")
    }
  }

  test("generator exercises the full signed range and both signs") {
    val s = (0L to 20L).flatMap(id =>
      Array.tabulate(AudioCodec.nSamples(id))(AudioCodec.sample(id, _)))
    assert(s.min < -30000 && s.max > 30000)
    assert(s.count(_ < 0) > 0 && s.count(_ > 0) > 0)
  }

  test("extractAudioFeatures: stats match the generator, no shuffle") {
    val docs = Seq((3L, "x"), (17L, "y")).toDF("doc_id", "text")
    val feats = Audio.extractAudioFeatures(spark,
      Audio.syntheticAudio(spark, docs))
    val byId = feats.collect().map(f => f.doc_id -> f).toMap
    for (id <- Seq(3L, 17L)) {
      val n = AudioCodec.nSamples(id)
      val s = Array.tabulate(n)(AudioCodec.sample(id, _))
      val f = byId(id)
      assert(f.sample_rate === AudioCodec.sampleRate(id).toLong)
      assert(f.n_samples === n.toLong)
      assert(f.sum_abs === s.map(v => math.abs(v.toLong)).sum)
      assert(f.peak === s.map(v => math.abs(v.toLong)).max)
      assert(f.zero_crossings ===
        s.sliding(2).count(p => p(0).toLong * p(1) < 0).toLong)
    }
    // exactly ONE exchange — the bare-id spread BEFORE rendering;
    // payloads themselves never shuffle (encode -> decode -> stats is
    // one narrow stage after it)
    val plan = finalPlan(feats.toDF())
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }

  test("transformAudio: resampled stats survive the re-encode round trip") {
    val docs = Seq((9L, "z")).toDF("doc_id", "text")
    val t = Audio.transformAudio(spark,
      Audio.syntheticAudio(spark, docs)).collect().head
    val n = AudioCodec.nSamples(9L)
    val even = Array.tabulate((n + 1) / 2)(k => AudioCodec.sample(9L, 2 * k))
    assert(t.sample_rate === AudioCodec.sampleRate(9L).toLong)
    assert(t.out_rate === AudioCodec.sampleRate(9L).toLong / 2)
    assert(t.n_samples === n.toLong)
    assert(t.out_samples === ((n + 1) / 2).toLong)
    assert(t.sum_abs === even.map(v => math.abs(v.toLong)).sum)
    assert(t.peak === even.map(v => math.abs(v.toLong)).max)
  }

  test("stereo WAV round trip: both channels recovered exactly, in their lanes") {
    for (id <- Seq(1L, 8L)) {
      val n = AudioCodec.nSamples(id)
      val l = Array.tabulate(n)(AudioCodec.sample(id, _))
      val r = Array.tabulate(n)(AudioCodec.sampleRight(id, _))
      val (rate, gl, gr) = AudioCodec.decodeWavStereo(
        AudioCodec.encodeWavStereo(l, r, AudioCodec.sampleRate(id)))
      assert(rate === AudioCodec.sampleRate(id))
      assert(gl.toSeq === l.toSeq, s"doc $id left channel corrupted")
      assert(gr.toSeq === r.toSeq, s"doc $id right channel corrupted")
    }
  }

  test("extractStereoFeatures: per-channel stats + cross-channel dot match the generators") {
    val docs = Seq((5L, "s")).toDF("doc_id", "text")
    val f = Audio.extractStereoFeatures(spark,
      Audio.syntheticStereo(spark, docs)).collect().head
    val n = AudioCodec.nSamples(5L)
    val l = Array.tabulate(n)(AudioCodec.sample(5L, _))
    val r = Array.tabulate(n)(AudioCodec.sampleRight(5L, _))
    assert(f.n_frames === n.toLong)
    assert(f.sum_abs_l === l.map(v => math.abs(v.toLong)).sum)
    assert(f.sum_abs_r === r.map(v => math.abs(v.toLong)).sum)
    assert(f.peak_l === l.map(v => math.abs(v.toLong)).max)
    assert(f.peak_r === r.map(v => math.abs(v.toLong)).max)
    assert(f.dot_lr === l.zip(r).map { case (a, b) => a.toLong * b }.sum)
  }

  test("fingerprint: exact replay of framing, energies and delta-sign bits") {
    for (id <- Seq(0L, 7L, 42L)) {
      val n = AudioCodec.nSamples(id / 2)
      val s = Array.tabulate(n)(AudioCodec.variantSample(id, _))
      // reference computation, independently written
      val e = new Array[Long](65)
      for (i <- 0 until n) e((i.toLong * 65 / n).toInt) += math.abs(s(i).toLong)
      var (lo, hi) = (0L, 0L)
      for (f <- 0 until 64 if e(f + 1) > e(f))
        if (f < 32) lo |= 1L << f else hi |= 1L << (f - 32)
      assert(AudioCodec.fingerprint(s) === ((lo, hi)), s"doc $id")
    }
  }

  test("planted variant pair flips at most bits 0-1: hamming <= 2 structurally") {
    for (g <- 0L until 30L) {
      val n = AudioCodec.nSamples(g)
      val base = AudioCodec.fingerprint(
        Array.tabulate(n)(AudioCodec.variantSample(2 * g, _)))
      val varnt = AudioCodec.fingerprint(
        Array.tabulate(n)(AudioCodec.variantSample(2 * g + 1, _)))
      val d = java.lang.Long.bitCount(base._1 ^ varnt._1) +
        java.lang.Long.bitCount(base._2 ^ varnt._2)
      assert(d <= 2, s"group $g planted pair at hamming $d")
      assert((base._1 ^ varnt._1) >> 2 === 0L && (base._2 ^ varnt._2) === 0L,
        s"group $g: only bits 0-1 may differ")
    }
  }

  test("audioNearDupPairs: banded candidates equal the brute-force pairs") {
    val ids = (0L until 36L)
    val docs = ids.map(i => (i, "x")).toDF("doc_id", "text")
    val fps = Audio.audioFingerprints(spark,
      Audio.syntheticAudioVariants(spark, docs)).toDF()
    val got = Audio.audioNearDupPairs(fps).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hs = fps.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = (for {
      a <- ids; b <- ids if a < b
      d = java.lang.Long.bitCount(hs(a)._1 ^ hs(b)._1) +
        java.lang.Long.bitCount(hs(a)._2 ^ hs(b)._2)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got === want, "banding must find exactly the brute-force pairs")
    // every planted even/odd pair surfaces
    for (g <- 0L until 18L)
      assert(want.exists(p => p._1 == 2 * g && p._2 == 2 * g + 1),
        s"planted pair of group $g must surface")
  }
}
