package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Audio-column pipeline: waveform payloads as opaque `binary` columns,
  * decoded / resampled per partition — the audio sibling of
  * [[Multimodal]] (reference repo has no media path; this is part of the
  * training-data extension surface).
  *
  * The codec is REAL: payloads are actual RIFF/WAVE containers written
  * and parsed by `javax.sound.sampled.AudioSystem` (pure JVM,
  * device-free — file I/O only, no mixer is ever opened), and every
  * statistic below is computed from the DECODED sample stream, not from
  * the payload bytes. The testdata ships no media, so the waveform
  * CONTENT is generated deterministically from `doc_id`
  * ([[AudioCodec.sample]]); the oracle replays that generator
  * arithmetic, so a hash match proves the full PCM → WAV bytes → decode
  * → samples path recovered exactly the waveform that was written
  * (16-bit PCM in WAV is lossless — any codec defect breaks the match).
  *
  * Spark-side shape mirrors the image rows: binary column, typed
  * output, iterator-to-iterator `mapPartitions` — one codec context per
  * partition, streaming over rows, no shuffle, no driver collect.
  */
object Audio {

  /** Real WAV codec + the deterministic waveform generator. */
  object AudioCodec {

    /** Sample rate for a doc: 8000 / 12000 / 16000 Hz. */
    def sampleRate(docId: Long): Int = (8000 + (docId % 3) * 4000).toInt

    /** Clip length for a doc: 160–400 samples (short fixed-size clips —
      * the fixture analogue of audio-chunk rows in a real corpus). */
    def nSamples(docId: Long): Int = (160 + (docId % 7) * 40).toInt

    /** The generator arithmetic the oracle replays: a signed 16-bit
      * sample as a function of (i, doc_id). All terms non-negative
      * before the mod, so `%` agrees between Java and SQL; the result
      * spans the full [-32768, 32767] range (peaks and sign changes are
      * data-dependent, not degenerate). */
    def sample(docId: Long, i: Int): Int =
      (((i.toLong * i * 31 + i.toLong * 17 + docId * 101) % 65536) - 32768).toInt

    private def pcmFormat(rate: Int): javax.sound.sampled.AudioFormat =
      new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        rate.toFloat, 16, 1, 2, rate.toFloat, /*bigEndian=*/ false)

    /** Encode signed 16-bit mono samples as a real WAV container. */
    def encodeWav(samples: Array[Int], rate: Int): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        val s = samples(i)
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), pcmFormat(rate), samples.length.toLong)
      javax.sound.sampled.AudioSystem.write(
        in, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decode a WAV payload: (sample rate, signed 16-bit samples), both
      * read from the container — rate from the parsed format chunk,
      * samples from the decoded frame stream. */
    def decodeWav(bytes: Array[Byte]): (Int, Array[Int]) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        s"payload is not 16-bit mono PCM: $fmt")
      val pcm = in.readAllBytes()
      val n = pcm.length / 2
      val samples = new Array[Int](n)
      var i = 0
      if (fmt.isBigEndian)
        while (i < n) { samples(i) = ((pcm(2 * i) << 8) | (pcm(2 * i + 1) & 0xff)).toShort.toInt; i += 1 }
      else
        while (i < n) { samples(i) = (((pcm(2 * i + 1) & 0xff) << 8) | (pcm(2 * i) & 0xff)).toShort.toInt; i += 1 }
      (fmt.getSampleRate.round, samples)
    }

    /** Right-channel generator for stereo clips — a different
      * coefficient set so the channels are genuinely distinct (their
      * dot product exercises sign mixing). */
    def sampleRight(docId: Long, i: Int): Int =
      (((i.toLong * i * 13 + i.toLong * 29 + docId * 211) % 65536) - 32768).toInt

    /** Encode interleaved L/R signed 16-bit samples as a real stereo
      * WAV (frame = 4 bytes: L little-endian, then R). */
    def encodeWavStereo(left: Array[Int], right: Array[Int], rate: Int): Array[Byte] = {
      require(left.length == right.length, "stereo channels must align")
      val pcm = new Array[Byte](left.length * 4)
      var i = 0
      while (i < left.length) {
        val l = left(i); val r = right(i)
        pcm(4 * i) = (l & 0xff).toByte
        pcm(4 * i + 1) = ((l >> 8) & 0xff).toByte
        pcm(4 * i + 2) = (r & 0xff).toByte
        pcm(4 * i + 3) = ((r >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        rate.toFloat, 16, 2, 4, rate.toFloat, /*bigEndian=*/ false)
      val out = new java.io.ByteArrayOutputStream()
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, left.length.toLong)
      javax.sound.sampled.AudioSystem.write(
        in, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decode a stereo WAV payload: (rate, left channel, right channel),
      * deinterleaved from the decoded frame stream. */
    def decodeWavStereo(bytes: Array[Byte]): (Int, Array[Int], Array[Int]) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 2 &&
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        !fmt.isBigEndian,
        s"payload is not 16-bit little-endian stereo PCM: $fmt")
      val pcm = in.readAllBytes()
      val n = pcm.length / 4
      val l = new Array[Int](n); val r = new Array[Int](n)
      var i = 0
      while (i < n) {
        l(i) = (((pcm(4 * i + 1) & 0xff) << 8) | (pcm(4 * i) & 0xff)).toShort.toInt
        r(i) = (((pcm(4 * i + 3) & 0xff) << 8) | (pcm(4 * i + 2) & 0xff)).toShort.toInt
        i += 1
      }
      (fmt.getSampleRate.round, l, r)
    }

    /** Decimate by 2: out(i) = in(2i), ceil(n/2) samples — the one
      * resampler with exactly replayable arithmetic (no interpolation,
      * no filter kernel whose rounding is implementation-defined). The
      * audio analogue of [[Multimodal.ImageCodec.subsample2]]. */
    def decimate2(samples: Array[Int]): Array[Int] = {
      val out = new Array[Int]((samples.length + 1) / 2)
      var i = 0
      while (i < out.length) { out(i) = samples(2 * i); i += 1 }
      out
    }

    /** 64-bit perceptual fingerprint over decoded PCM — the
      * Shazam-shape device with exact integer semantics: the clip is
      * cut into 65 frames (sample i lands in frame `i·65 div n` — the
      * frame map IS the definition, so there is no boundary rounding
      * to disagree on), each frame's energy is the sum of |sample|,
      * and bit f (0..63) is set when E(f+1) > E(f). Sign-of-energy-
      * delta survives level shifts and mild noise, which is what makes
      * it a NEAR-dup signal rather than an exact hash; every step is
      * integer, so the SQL oracle replays it bit for bit. Returns
      * (lo, hi): bit k in lo for k<32, else hi at k−32 (the
      * [[Multimodal.ImageHash]] split). */
    def fingerprint(samples: Array[Int]): (Long, Long) = {
      val n = samples.length
      require(n >= 65, s"fingerprint needs >= 65 samples, got $n")
      val e = new Array[Long](65)
      var i = 0
      while (i < n) {
        e((i.toLong * 65 / n).toInt) += math.abs(samples(i).toLong)
        i += 1
      }
      var (lo, hi) = (0L, 0L)
      var f = 0
      while (f < 64) {
        if (e(f + 1) > e(f)) {
          if (f < 32) lo |= 1L << f else hi |= 1L << (f - 32)
        }
        f += 1
      }
      (lo, hi)
    }

    /** Base waveform of a near-dup GROUP — unlike [[sample]], the
      * group id modulates the quadratic and linear coefficients, not
      * just the phase: two different groups get genuinely different
      * waveform SHAPES, so their energy-delta fingerprints decorrelate
      * (with the shared-shape generator, 4% of all unrelated pairs
      * landed within hamming 3 — a fixture artifact that would swamp
      * the planted pairs). */
    def pairSample(grp: Long, i: Int): Int =
      (((i.toLong * i * (31 + grp % 29) + i.toLong * (17 + grp % 19) +
        grp * 101) % 65536) - 32768).toInt

    /** Near-dup variant generator: docs pair up (group = doc_id div 2);
      * the even doc carries the group's base waveform, the odd doc the
      * SAME waveform with its first four samples wrapped by +7 in
      * 16-bit space (`((s+32768+7) mod 65536) − 32768` — range-safe,
      * sign-safe, and an exact-arithmetic stand-in for the level
      * shift/noise a re-encoded copy picks up). Only frames 0–1 can
      * change, so only fingerprint bits 0–1 can flip: every planted
      * pair lands at hamming ≤ 2, inside the banded-join guarantee. */
    def variantSample(docId: Long, i: Int): Int = {
      val base = pairSample(docId / 2, i)
      if (docId % 2 == 1 && i < 4) ((base + 32768 + 7) % 65536) - 32768
      else base
    }
  }

  /** Synthetic audio payloads: one real WAV clip per document, rendered
    * and encoded executor-side (iterator-to-iterator, no shuffle). */
  def syntheticAudio(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // bare-id repartition before rendering — the fixture arrives as one
    // parquet split, which would serialize the codec onto one core; the
    // exchange moves 8 bytes/row (see Multimodal.syntheticImages)
    docs.select(col("doc_id").cast("long")).repartition(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = AudioCodec.nSamples(id)
          val samples = Array.tabulate(n)(AudioCodec.sample(id, _))
          (id, AudioCodec.encodeWav(samples, AudioCodec.sampleRate(id)))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Typed feature row produced by the decode stage. Crossings count
    * strict sign changes between consecutive samples (zeros break a
    * run — the common zcr definition with exact integer semantics). */
  case class AudioFeature(doc_id: Long, sample_rate: Long, n_samples: Long,
                          sum_abs: Long, peak: Long, zero_crossings: Long)

  /** Partition-streamed decode: WAV payloads → typed features, every
    * value read from the DECODED container (rate from the format chunk,
    * stats from the sample stream). */
  def extractAudioFeatures(spark: SparkSession, payloads: DataFrame): Dataset[AudioFeature] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (rate, s) = AudioCodec.decodeWav(bytes)
          var (sumAbs, peak, zc) = (0L, 0L, 0L)
          var i = 0
          while (i < s.length) {
            val a = math.abs(s(i).toLong)
            sumAbs += a
            if (a > peak) peak = a
            if (i > 0 && s(i - 1).toLong * s(i) < 0) zc += 1
            i += 1
          }
          AudioFeature(id, rate.toLong, s.length.toLong, sumAbs, peak, zc)
        }
      }
  }

  /** Synthetic STEREO payloads: one real 2-channel WAV per document
    * (left = [[AudioCodec.sample]], right = [[AudioCodec.sampleRight]],
    * interleaved into 4-byte frames). */
  def syntheticStereo(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).repartition(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = AudioCodec.nSamples(id)
          (id, AudioCodec.encodeWavStereo(
            Array.tabulate(n)(AudioCodec.sample(id, _)),
            Array.tabulate(n)(AudioCodec.sampleRight(id, _)),
            AudioCodec.sampleRate(id)))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Typed per-channel feature row; dot_lr is the exact integer dot
    * product of the two decoded channels (bounded by n·2³⁰ < 2⁴⁰ —
    * no overflow at clip lengths) — the channel-mixing statistic that
    * catches any deinterleave defect a per-channel sum would miss. */
  case class StereoFeature(doc_id: Long, sample_rate: Long, n_frames: Long,
                           sum_abs_l: Long, sum_abs_r: Long,
                           peak_l: Long, peak_r: Long, dot_lr: Long)

  /** Partition-streamed stereo decode: deinterleave the frame stream,
    * per-channel stats + the cross-channel dot product. */
  def extractStereoFeatures(spark: SparkSession, payloads: DataFrame): Dataset[StereoFeature] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (rate, l, r) = AudioCodec.decodeWavStereo(bytes)
          var (sl, sr, pl, pr, dot) = (0L, 0L, 0L, 0L, 0L)
          var i = 0
          while (i < l.length) {
            val a = math.abs(l(i).toLong); val b = math.abs(r(i).toLong)
            sl += a; sr += b
            if (a > pl) pl = a
            if (b > pr) pr = b
            dot += l(i).toLong * r(i)
            i += 1
          }
          StereoFeature(id, rate.toLong, l.length.toLong, sl, sr, pl, pr, dot)
        }
      }
  }

  /** Synthetic near-dup audio payloads: real WAV clips where each
    * doc-id PAIR shares one waveform up to the variant perturbation
    * ([[AudioCodec.variantSample]]) — the fixture for the perceptual
    * near-dup family. Rate/length ride the GROUP id so a pair's clips
    * align frame for frame. */
  def syntheticAudioVariants(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).repartition(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = AudioCodec.nSamples(id / 2)
          val samples = Array.tabulate(n)(AudioCodec.variantSample(id, _))
          (id, AudioCodec.encodeWav(samples, AudioCodec.sampleRate(id / 2)))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Typed fingerprint row — 64 energy-delta sign bits split across
    * two longs (the [[Multimodal.ImageHash]] convention). */
  case class AudioFingerprint(doc_id: Long, fp_lo: Long, fp_hi: Long)

  /** Partition-streamed perceptual fingerprinting: WAV payloads →
    * decoded PCM → [[AudioCodec.fingerprint]]. Same scale shape as
    * every media row: one codec context per partition, only 24 bytes
    * per clip leave the stage. */
  def audioFingerprints(spark: SparkSession, payloads: DataFrame): Dataset[AudioFingerprint] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (_, s) = AudioCodec.decodeWav(bytes)
          val (lo, hi) = AudioCodec.fingerprint(s)
          AudioFingerprint(id, lo, hi)
        }
      }
  }

  /** Near-duplicate clip pairs from the fingerprints — the shared
    * [[BandedHamming]] device (4×16-bit pigeonhole banding): candidate
    * pairs from a (band, value) self-equi-join, exact popcount verify
    * on candidates only, never all pairs. */
  def audioNearDupPairs(fps: DataFrame, maxHamming: Int = 3): DataFrame =
    BandedHamming.pairs(fps.select(col("doc_id"),
      col("fp_lo").as("lo"), col("fp_hi").as("hi")), maxHamming)

  /** Typed output row of the resample stage. */
  case class AudioTransform(doc_id: Long, sample_rate: Long, out_rate: Long,
                            n_samples: Long, out_samples: Long,
                            sum_abs: Long, peak: Long)

  /** Partition-streamed transform: decode → decimate by 2 → RE-encode
    * as WAV at the halved rate → decode again → stats. As with the
    * image transform, the double round trip is deliberate: the reported
    * stats come from the re-decoded resampled clip, certifying the
    * write path as well as the read path. */
  def transformAudio(spark: SparkSession, payloads: DataFrame): Dataset[AudioTransform] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (rate, s) = AudioCodec.decodeWav(bytes)
          val resampled = AudioCodec.encodeWav(AudioCodec.decimate2(s), rate / 2)
          val (outRate, o) = AudioCodec.decodeWav(resampled)
          var (sumAbs, peak) = (0L, 0L)
          var i = 0
          while (i < o.length) {
            val a = math.abs(o(i).toLong)
            sumAbs += a
            if (a > peak) peak = a
            i += 1
          }
          AudioTransform(id, rate.toLong, outRate.toLong,
            s.length.toLong, o.length.toLong, sumAbs, peak)
        }
      }
  }
}
