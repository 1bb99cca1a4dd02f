package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.FakeCodec

/** Binary-column plumbing: schema, determinism, partition-stream decode. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures: typed schema, deterministic checksums, no shuffle") {
    val docs = Seq((1L, "hello world"), (2L, "a" * 200)).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, Multimodal.asBinaryPayloads(docs))
    val byId = feats.collect().map(f => f.doc_id -> f).toMap
    assert(byId(1L).n_bytes === 11L)
    assert(byId(1L).checksum === "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(byId(2L).fake_width === (200 % 64) + 1)
    assert(byId(2L).fake_height === ((200 / 64) % 64) + 1)
    // plan stays shuffle-free: payload -> features is a single narrow stage
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("FakeCodec.resize keeps every factor-th byte, deterministic") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val r = FakeCodec.resize(bytes, 10)
    assert(r.length === 10 && r(1) === 10.toByte)
  }

  test("FakeCodec.sampleFrames strides frames of fixed size") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val frames = FakeCodec.sampleFrames(bytes, frameSize = 10, stride = 2)
    assert(frames.size === 5 && frames.head.length === 10)
    assert(frames(1)(0) === 20.toByte)
  }
}
