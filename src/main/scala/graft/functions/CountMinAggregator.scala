package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.unsafe.Platform

/** Count-min sketch over string keys: a depth x width matrix of long
  * counters. `reduce` increments one counter per row (hash seeded by the
  * row index); `merge` is elementwise addition — commutative and
  * associative integer math, so the final sketch (and every estimate
  * read from it) is DETERMINISTIC for any partitioning or aggregation
  * order. Estimate(key) = min over rows of its counters: always an
  * over-estimate (counters only ever add), within eps*N of truth with
  * the standard (e/width, 1-(1/e)^depth) guarantee.
  *
  * The sketch is the bounded-state answer to "top terms over 100 TB":
  * fixed depth*width*8 bytes per partial regardless of vocabulary size,
  * where an exact per-term count grows with the corpus. */
class CountMinAggregator(depth: Int, width: Int)
  extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    var d = 0
    while (d < depth) {
      buf(d * width + CountMin.bucket(key, d, width)) += 1
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object CountMin {
  /** Row-d bucket of a key: xxhash64 of its UTF-8 bytes, seeded by the
    * row index, reduced mod width. Shared by the aggregator (executor
    * side) and estimate reads (driver side) — the two must agree. */
  def bucket(key: String, d: Int, width: Int): Int = {
    val bytes = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
      bytes.length, d.toLong)
    (((h % width) + width) % width).toInt
  }

  /** Point estimate from a finished sketch. */
  def estimate(sketch: Array[Long], key: String, depth: Int, width: Int): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val v = sketch(d * width + bucket(key, d, width))
      if (v < best) best = v
      d += 1
    }
    best
  }

  /** Column form: `count_min(key)` in groupBy().agg(...). */
  def count_min(depth: Int, width: Int)(key: Column): Column =
    udaf(new CountMinAggregator(depth, width), Encoders.STRING).apply(key)
}
