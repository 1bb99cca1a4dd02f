package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: media payloads as opaque `binary` columns
  * with typed metadata, decoded / transformed per partition.
  *
  * The codec is REAL: images are encoded and decoded as actual PNG
  * containers through `javax.imageio` (pure JVM, headless-safe, zero
  * external deps), and every pixel statistic below is read from the
  * DECODED raster — not from the payload bytes. The testdata ships no
  * media, so the image CONTENT is generated deterministically from
  * `doc_id` ([[ImageCodec.pixelRgb]]); the oracle replays that generator
  * arithmetic, so a hash match proves the full encode → PNG bytes →
  * decode → raster path recovered exactly the pixels that were written
  * (PNG is lossless — any codec defect breaks the match).
  *
  * Spark-side shape: binary column, explicit feature schema, and
  * iterator-to-iterator `mapPartitions` decode — one codec context per
  * partition, streaming over rows, never materializing the partition
  * (the Scala analogue of a batched mapInPandas/mapInArrow pipeline).
  * Feature extraction is embarrassingly parallel; payloads stay in the
  * partition where they were produced — no shuffle, no driver collect.
  */
object Multimodal {

  /** Real PNG codec + the deterministic test-pattern generator. */
  object ImageCodec {

    // ImageIO's default stream cache is DISK-backed: every encode/decode
    // creates and deletes a temp file, which at 4 round trips per doc
    // cost ~10x the actual codec work (measured 0.25 -> 2.8 s on the
    // p17 row). Memory-backed streams for byte-array payloads.
    javax.imageio.ImageIO.setUseCache(false)

    /** Image dimensions for a doc: 4–16 × 3–9 px test patterns. */
    def dims(docId: Long): (Int, Int) =
      (((docId % 13) + 4).toInt, ((docId % 7) + 3).toInt)

    /** The generator arithmetic the oracle replays: channel values as a
      * function of (x, y, doc_id). All terms non-negative, so `%` agrees
      * between Java and SQL. */
    def pixelRgb(docId: Long, x: Int, y: Int): (Int, Int, Int) =
      (((x * 7L + y * 13L + docId) % 256).toInt,
       ((x * 3L + y * 5L + docId * 11L) % 256).toInt,
       ((x * 17L + y * 2L + docId * 3L) % 256).toInt)

    /** Render the doc's test pattern and encode it as a real PNG. */
    def encodePng(docId: Long): Array[Byte] = {
      val (w, h) = dims(docId)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = pixelRgb(docId, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "png", out),
        "no PNG writer available in this JVM")
      out.toByteArray
    }

    /** Decode a PNG payload back to its raster. */
    def decodePng(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      img
    }

    /** Per-channel pixel sums of a decoded raster, via the packed-RGB
      * accessor so the result is independent of the decoder's internal
      * band order (ImageIO returns BGR byte rasters for RGB PNGs). */
    def channelSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      (sr, sg, sb)
    }

    /** Stride-2 spatial subsample — a real downsample performed on the
      * decoded raster: out(x, y) = in(2x, 2y), output ceil(w/2) ×
      * ceil(h/2). Exactly replayable arithmetic (unlike interpolating
      * resamplers, whose rounding is implementation-defined). */
    def subsample2(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
      val (rw, rh) = ((img.getWidth + 1) / 2, (img.getHeight + 1) / 2)
      val out = new java.awt.image.BufferedImage(
        rw, rh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < rh) {
        var x = 0
        while (x < rw) {
          out.setRGB(x, y, img.getRGB(2 * x, 2 * y))
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Real multi-frame video codec: clips are actual animated GIF
    * containers written and read through `javax.imageio`'s sequence
    * API. GIF is the one multi-frame format the stock JVM can both
    * write and read, and for INDEXED images it is lossless — frames
    * use an explicit 256-entry grayscale palette, so every decoded
    * pixel equals the generated one exactly and the oracle can replay
    * the generator arithmetic (any codec or frame-ordering defect
    * breaks the hash). */
  object VideoCodec {

    // same disk-backed-stream trap as ImageCodec (whose initializer may
    // never run on a video-only path): without this every encode/decode
    // creates and deletes a temp FILE per stream
    javax.imageio.ImageIO.setUseCache(false)

    /** Clip geometry for a doc: 3–6 frames of 4–12 × 3–7 px. */
    def nFrames(docId: Long): Int = (3 + docId % 4).toInt
    def frameDims(docId: Long): (Int, Int) =
      (((docId % 9) + 4).toInt, ((docId % 5) + 3).toInt)

    /** The generator arithmetic the oracle replays: gray value as a
      * function of (x, y, frame, doc_id); non-negative terms so `%`
      * agrees between Java and SQL. */
    def pixelGray(docId: Long, f: Int, x: Int, y: Int): Int =
      ((x * 7L + y * 13L + f * 29L + docId) % 256).toInt

    private val grayPalette: java.awt.image.IndexColorModel = {
      val g = Array.tabulate[Byte](256)(_.toByte)
      new java.awt.image.IndexColorModel(8, 256, g, g, g)
    }

    /** Render the doc's frames and encode one real animated GIF.
      *
      * Frames are written PROGRESSIVE (interlaceFlag=FALSE, set through
      * per-frame metadata): the JDK's GIF writer interlaces by default,
      * and its reader de-interlaces frames shorter than the 8-row pass
      * structure incorrectly (h=4 frames came back with rows permuted
      * and one row dropped — caught by the sum oracle, which is exactly
      * the class of silent codec defect these rows exist to catch). */
    def encodeGif(docId: Long): Array[Byte] = {
      val (w, h) = frameDims(docId)
      encodeFrameSeq(w, h, nFrames(docId), pixelGray(docId, _, _, _))
    }

    /** Shared GIF sequence encoder: render `n` frames of `w`×`h` from
      * the supplied (frame, x, y) → gray generator and write one real
      * animated GIF container. Factored out of [[encodeGif]] so the
      * near-dup VARIANT fixture ([[encodeVariantGif]]) uses byte-for-
      * byte the same container path (palette, progressive frames,
      * shared metadata tree). */
    private def encodeFrameSeq(w: Int, h: Int, n: Int,
                               gray: (Int, Int, Int) => Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        // one metadata object serves every frame: all frames of a doc
        // share dims/palette, and the writer only READS it (verified
        // bytes-identical to per-frame construction) — building the
        // tree per frame was ~40% of encode cost
        var meta: javax.imageio.metadata.IIOMetadata = null
        var f = 0
        while (f < n) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, gray(f, x, y)); x += 1 }
            y += 1
          }
          if (meta == null) {
            meta = writer.getDefaultImageMetadata(
              new javax.imageio.ImageTypeSpecifier(img), writer.getDefaultWriteParam)
            val fmt = "javax_imageio_gif_image_1.0"
            val root = meta.getAsTree(fmt)
              .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            root.getElementsByTagName("ImageDescriptor").item(0)
              .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
              .setAttribute("interlaceFlag", "FALSE")
            meta.setFromTree(fmt, root)
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
          f += 1
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      out.toByteArray
    }

    /** Variant-clip frame count: 65 frames give 64 consecutive-frame
      * gray-sum deltas — one bit each, the video edition of the audio
      * energy-delta fingerprint ([[graft.ops.Audio.AudioCodec.fingerprint]]). */
    val fpFrames = 65

    /** Variant-clip geometry rides the GROUP id (doc_id div 2) so a
      * planted pair's clips align frame for frame: 4–8 × 3–5 px. */
    def variantDims(grp: Long): (Int, Int) =
      (((grp % 5) + 4).toInt, ((grp % 3) + 3).toInt)

    /** Base gray generator of a near-dup GROUP — the group id modulates
      * the quadratic and linear FRAME coefficients, not just the phase
      * (the [[graft.ops.Audio.AudioCodec.pairSample]] device): two
      * different groups walk genuinely different gray-sum trajectories,
      * so their delta-sign fingerprints decorrelate instead of every
      * unrelated pair landing within banding distance. */
    def pairGray(grp: Long, f: Int, x: Int, y: Int): Int =
      ((x * 7L + y * 13L + f.toLong * f * (19 + grp % 23) +
        f.toLong * (11 + grp % 17) + grp * 101) % 256).toInt

    /** Near-dup variant generator: docs pair up (group = doc_id div 2);
      * the even doc carries the group's base frames, the odd doc the
      * SAME frames with the first three brightened by +5 gray levels
      * (mod 256 — exact-arithmetic stand-in for the re-encode/levels
      * drift a copied clip picks up). Only gray sums S(0..2) can
      * change, and bit f compares S(f) with S(f+1), so only bits 0–2
      * can flip: every planted pair lands at hamming ≤ 3, inside the
      * banded-join guarantee. */
    def variantGray(docId: Long, f: Int, x: Int, y: Int): Int = {
      val base = pairGray(docId / 2, f, x, y)
      if (docId % 2 == 1 && f < 3) (base + 5) % 256 else base
    }

    /** Encode one near-dup VARIANT clip: a real 65-frame animated GIF
      * through the same container path as [[encodeGif]]. */
    def encodeVariantGif(docId: Long): Array[Byte] = {
      val (w, h) = variantDims(docId / 2)
      encodeFrameSeq(w, h, fpFrames, variantGray(docId, _, _, _))
    }

    /** Decode a GIF payload: frame count + a frame accessor. Callers
      * MUST `dispose()` the returned reader when done. */
    def openGif(bytes: Array[Byte]): javax.imageio.ImageReader = {
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      reader
    }

    /** Gray-sum of a decoded indexed frame, read through the packed-RGB
      * accessor (palette gray ⇒ all three channels equal the index). */
    def graySum(img: java.awt.image.BufferedImage): Long = {
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { sum += img.getRGB(x, y) & 0xff; x += 1 }
        y += 1
      }
      sum
    }
  }

  /** Synthetic image payloads: one real PNG per document, rendered and
    * encoded executor-side (iterator-to-iterator, no shuffle). The
    * binary-column fixture for the decode rows below. */
  def syntheticImages(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // repartition the BARE ids before rendering: the fixture tables
    // arrive as a single small parquet split, which would serialize all
    // codec work onto one core — the exchange moves 8 bytes/row, the
    // stage it unlocks does all the CPU work. (Payloads themselves
    // never shuffle; a real corpus arrives already spread.)
    docs.select(col("doc_id").cast("long")).repartition(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        // a real pipeline opens shared encoder state here, once per partition
        ids.map(id => (id, ImageCodec.encodePng(id)))
      }
      .toDF("doc_id", "payload")
  }

  /** Typed feature row produced by the decode stage. */
  case class ImageFeature(doc_id: Long, width: Long, height: Long,
                          n_channels: Long, sum_r: Long, sum_g: Long,
                          sum_b: Long)

  /** Partition-streamed decode: PNG payloads → typed features, every
    * value read from the DECODED raster (dims from the container header,
    * channel count from the color model, sums from the pixels). */
  def extractImageFeatures(spark: SparkSession, payloads: DataFrame): Dataset[ImageFeature] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = ImageCodec.decodePng(bytes)
          val (sr, sg, sb) = ImageCodec.channelSums(img)
          ImageFeature(id, img.getWidth.toLong, img.getHeight.toLong,
            img.getColorModel.getNumComponents.toLong, sr, sg, sb)
        }
      }
  }

  /** Typed output row of the transform stage. */
  case class ImageTransform(doc_id: Long, width: Long, height: Long,
                            resized_width: Long, resized_height: Long,
                            sum_r: Long, sum_g: Long, sum_b: Long)

  /** Partition-streamed transform: decode → stride-2 downsample →
    * RE-encode to PNG → decode again → stats. The double round trip is
    * deliberate: the reported sums come from the re-decoded resized
    * image, so they certify the write path (encode of a transformed
    * raster) as well as the read path. */
  def transformImages(spark: SparkSession, payloads: DataFrame): Dataset[ImageTransform] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = ImageCodec.decodePng(bytes)
          val resizedPng = {
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(ImageCodec.subsample2(img), "png", out)
            out.toByteArray
          }
          val resized = ImageCodec.decodePng(resizedPng)
          val (sr, sg, sb) = ImageCodec.channelSums(resized)
          ImageTransform(id, img.getWidth.toLong, img.getHeight.toLong,
            resized.getWidth.toLong, resized.getHeight.toLong, sr, sg, sb)
        }
      }
  }

  /** Typed perceptual-hash row: the 64-bit average-hash split into two
    * longs (bit k of the 8×8 grid lives in `lo` for k<32, else in `hi`
    * at k−32 — a single long cannot hold bit 63 without sign games the
    * SQL oracle would have to mirror). */
  case class ImageHash(doc_id: Long, ahash_lo: Long, ahash_hi: Long)

  /** Perceptual average-hash (aHash) over the DECODED raster — the
    * image near-dup signal: two images whose pixels differ by small
    * shifts land at small hamming distance. Every step is EXACT integer
    * arithmetic so the oracle can replay it bit for bit: integer-weight
    * luma ((299r + 587g + 114b) div 1000), 8×8 stride sampling at
    * (i·w div 8, j·h div 8), threshold at the integer mean of the 64
    * samples (no float DCT — pHash's rounding is codec-defined, aHash's
    * is not). Partition-streamed decode like every media row. */
  def imageAHash(spark: SparkSession, payloads: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = ImageCodec.decodePng(bytes)
          val (w, h) = (img.getWidth, img.getHeight)
          val g = new Array[Long](64)
          var j = 0
          while (j < 8) {
            var i = 0
            while (i < 8) {
              val rgb = img.getRGB(i * w / 8, j * h / 8)
              g(j * 8 + i) = (((rgb >> 16) & 0xff) * 299L +
                ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L) / 1000L
              i += 1
            }
            j += 1
          }
          val mean = g.sum / 64L
          var (lo, hi) = (0L, 0L)
          var k = 0
          while (k < 64) {
            if (g(k) > mean) {
              if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
            }
            k += 1
          }
          ImageHash(id, lo, hi)
        }
      }
  }

  /** Near-duplicate image pairs from the aHashes — the shared
    * [[BandedHamming]] device (4×16-bit pigeonhole banding, candidates
    * only, never all pairs). The oracle computes ALL pairs directly
    * (fixture-sized), so a hash match proves the banding lost nothing
    * the ≤3-hamming guarantee promises. */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    BandedHamming.pairs(hashes.select(col("doc_id"),
      col("ahash_lo").as("lo"), col("ahash_hi").as("hi")), maxHamming)

  /** Distinct-signature near-dup pairs with multiplicities — the scale
    * path ([[BandedHamming.distinctPairs]]) for logo/icon-heavy corpora
    * where many images share one exact aHash and doc-level pair output
    * goes quadratic in the hot signatures' multiplicity. */
  def imageNearDupDistinctPairs(hashes: DataFrame,
                                maxHamming: Int = 3): DataFrame =
    BandedHamming.distinctPairs(hashes.select(col("doc_id"),
      col("ahash_lo").as("lo"), col("ahash_hi").as("hi")), maxHamming)

  /** Synthetic video payloads: one real animated GIF per document
    * (ids repartitioned first — same rationale as [[syntheticImages]],
    * and it matters most here: GIF sequence encode is the costliest
    * codec in the catalog). */
  def syntheticVideos(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).repartition(col("doc_id")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, VideoCodec.encodeGif(id))))
      .toDF("doc_id", "payload")
  }

  /** Synthetic near-dup video payloads: real animated GIFs where each
    * doc-id PAIR shares one frame sequence up to the variant
    * perturbation ([[VideoCodec.variantGray]]) — the fixture for the
    * video perceptual near-dup family (the GIF sibling of
    * [[graft.ops.Audio.syntheticAudioVariants]]). Dims ride the group
    * id so a pair's clips align frame for frame. */
  def syntheticVideoVariants(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).repartition(col("doc_id")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, VideoCodec.encodeVariantGif(id))))
      .toDF("doc_id", "payload")
  }

  /** Typed fingerprint row — 64 gray-sum-delta sign bits split across
    * two longs (the [[ImageHash]] convention). */
  case class VideoFingerprint(doc_id: Long, fp_lo: Long, fp_hi: Long)

  /** Partition-streamed video perceptual fingerprinting: decode the
    * 65-frame GIF container, per-frame gray sums from the decoded
    * rasters, bit f = S(f+1) > S(f). Sign-of-brightness-delta survives
    * level shifts and mild per-frame noise — a NEAR-dup signal, not an
    * exact hash — and every step is integer, so the SQL oracle replays
    * it bit for bit. One codec context per payload inside a streaming
    * partition iterator; only 24 bytes per clip leave the stage. */
  def videoFingerprints(spark: SparkSession, payloads: DataFrame): Dataset[VideoFingerprint] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val reader = VideoCodec.openGif(bytes)
          try {
            val n = reader.getNumImages(true)
            require(n >= VideoCodec.fpFrames,
              s"video fingerprint needs >= ${VideoCodec.fpFrames} frames, got $n")
            val s = Array.tabulate(n)(f => VideoCodec.graySum(reader.read(f)))
            var (lo, hi) = (0L, 0L)
            var f = 0
            while (f < 64) {
              if (s(f + 1) > s(f)) {
                if (f < 32) lo |= 1L << f else hi |= 1L << (f - 32)
              }
              f += 1
            }
            VideoFingerprint(id, lo, hi)
          } finally reader.dispose()
        }
      }
  }

  /** Near-duplicate clip pairs from the video fingerprints — the shared
    * [[BandedHamming]] device (4×16-bit pigeonhole banding): candidate
    * pairs from a (band, value) self-equi-join, exact popcount verify
    * on candidates only, never all pairs. */
  def videoNearDupPairs(fps: DataFrame, maxHamming: Int = 3): DataFrame =
    BandedHamming.pairs(fps.select(col("doc_id"),
      col("fp_lo").as("lo"), col("fp_hi").as("hi")), maxHamming)

  /** One output row per SAMPLED frame. */
  case class VideoFrame(doc_id: Long, frame_idx: Long, n_frames: Long,
                        width: Long, height: Long, sum_gray: Long)

  /** Partition-streamed frame sampling: decode the multi-frame
    * container, keep every `stride`-th frame, stats from each decoded
    * frame's raster. The canonical video preprocessing shape — a 100 TB
    * corpus of clips is frame-sampled exactly like this, with the
    * decoder opened per payload inside a streaming partition iterator
    * and only the (tiny) per-frame features ever leaving the stage. */
  def sampleVideoFrames(spark: SparkSession, payloads: DataFrame,
                        stride: Int = 2): Dataset[VideoFrame] = {
    require(stride >= 1, "frame-sampling stride must be >= 1")
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val reader = VideoCodec.openGif(bytes)
          try {
            val n = reader.getNumImages(true)
            (0 until n by stride).map { f =>
              val img = reader.read(f)
              VideoFrame(id, f.toLong, n.toLong, img.getWidth.toLong,
                img.getHeight.toLong, VideoCodec.graySum(img))
            }
          } finally reader.dispose()
        }
      }
  }
}
