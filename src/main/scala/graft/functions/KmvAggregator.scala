package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values distinct sketch: keep the k smallest DISTINCT hash
  * values seen. With uniform 60-bit hashes, the k-th smallest value
  * h_(k) estimates the distinct count as (k-1) * 2^60 / h_(k) — the
  * classic KMV/bottom-k estimator (relative error ~ 1/sqrt(k-2)).
  *
  * This is the bounded-state answer to "distinct terms per group over
  * 100 TB": an exact count-distinct shuffles every distinct value to
  * its group's reducer; the sketch keeps k longs per partial, merges
  * map-side, and ships at most k longs per (group, map task). Unlike
  * HLL it is exactly replayable in any engine with the same hash (the
  * sketch CONTENT is just "the k smallest md5 values"), which is what
  * lets the catalog row carry a full hash oracle instead of an
  * approximate tolerance check.
  *
  * Determinism: the kept set is a pure function of the input VALUE set
  * — insertion order, partitioning, and merge order cannot change "the
  * k smallest distinct values" — so estimates replay bit-for-bit.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  // buffer: ascending, distinct, size <= k (worst kept value at the end).
  // Steady-state order matters: once the buffer is full, almost every
  // hash satisfies v >= buf.last and must be rejected in O(1) BEFORE any
  // membership work — a contains() scan first would pay ~k comparisons
  // per token instance across a whole corpus. Membership on the sorted
  // buffer is a binary search, so even the rare surviving insert is
  // O(log k) + one copy instead of an O(k) scan.
  private def insert(buf: Seq[Long], v: Long): Seq[Long] =
    if (buf.size == k && v >= buf.last) buf
    else {
      val arr = buf.toIndexedSeq
      var lo = 0; var hi = arr.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) < v) lo = mid + 1 else hi = mid
      }
      if (lo < arr.length && arr(lo) == v) buf // already kept
      else {
        val grown = (arr.take(lo) :+ v) ++ arr.drop(lo)
        if (grown.size <= k) grown else grown.init
      }
    }

  override def zero: Seq[Long] = Seq.empty
  override def reduce(buf: Seq[Long], v: Long): Seq[Long] = insert(buf, v)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[Long]): Seq[Long] = buf
  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object KmvAggregator {
  /** Column form: `kmv(k)(hash)` in groupBy().agg(...). */
  def kmv(k: Int)(hash: Column): Column =
    udaf(new KmvAggregator(k), Encoders.scalaLong).apply(hash)
}
