package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side shape is real — binary column, explicit feature schema,
  * partition-iterator decode (the Scala analogue of a batched
  * mapInPandas/mapInArrow pipeline: one decoder instantiation per
  * partition, streaming over rows, never materializing the partition).
  * The actual image/audio codec is STUBBED (`FakeCodec`): this container
  * ships no media libraries, so decode is a deterministic function of the
  * bytes, clearly marked, with the same signature a real codec would have.
  *
  * Scale notes: feature extraction is embarrassingly parallel; the only
  * schema contract is `MediaFeature`. Binary payloads stay in the
  * partition where they were read — no shuffle, no driver collect.
  */
object Multimodal {

  /** Typed feature row produced by the decode stage. */
  case class MediaFeature(doc_id: Long, n_bytes: Long, fake_width: Int,
                          fake_height: Int, checksum: String)

  /** STUB codec — deterministic fake standing in for a real image/audio
    * decoder (none available in this environment). A real implementation
    * would parse the container format here; everything around it (schema,
    * batching, partitioning) is production-shaped.
    */
  object FakeCodec {
    /** "Decode" dimensions from the payload deterministically. */
    def decodeDims(bytes: Array[Byte]): (Int, Int) =
      ((bytes.length % 64) + 1, ((bytes.length / 64) % 64) + 1)

    def md5Hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString

    /** "Resize": deterministic downsample of the payload bytes. */
    def resize(bytes: Array[Byte], factor: Int): Array[Byte] = {
      require(factor > 0)
      bytes.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }
    }

    /** "Frame-sample": split payload into frames of `frameSize` bytes and
      * keep every `stride`-th frame. */
    def sampleFrames(bytes: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
      bytes.grouped(frameSize).zipWithIndex
        .collect { case (f, i) if i % stride == 0 => f }.toSeq
  }

  /** documents.text re-encoded as a binary media payload — the fixture
    * for the binary-column pipeline (no real media in the testdata). */
  def asBinaryPayloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Typed output row of the transform stage. */
  case class MediaTransform(doc_id: Long, n_bytes: Long, n_resized_bytes: Long,
                            n_frames_sampled: Long, resized_checksum: String)

  /** Partition-streamed media transforms: resize + frame-sample each
    * payload through the (stub) codec. Same iterator-to-iterator batch
    * shape as extractFeatures; byte counts are verifiable arithmetic,
    * the checksum pins the actual transformed bytes. */
  def transformMedia(spark: SparkSession, payloads: DataFrame, resizeFactor: Int = 4,
                     frameSize: Int = 32, frameStride: Int = 2): Dataset[MediaTransform] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val resized = FakeCodec.resize(bytes, resizeFactor)
          val frames = FakeCodec.sampleFrames(bytes, frameSize, frameStride)
          MediaTransform(id, bytes.length.toLong, resized.length.toLong,
            frames.size.toLong, FakeCodec.md5Hex(resized))
        }
      }
  }

  /** Partition-streamed decode: binary payloads -> typed features.
    * Iterator-to-iterator (no per-partition materialization), one codec
    * context per partition — the mapInPandas batch shape in Scala. */
  def extractFeatures(spark: SparkSession, payloads: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real codecs would open shared decode state here, once per partition
        rows.map { case (id, bytes) =>
          val (w, h) = FakeCodec.decodeDims(bytes)
          MediaFeature(id, bytes.length.toLong, w, h, FakeCodec.md5Hex(bytes))
        }
      }
  }
}
