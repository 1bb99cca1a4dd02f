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
  // buffer: ascending, distinct, size <= k (worst kept value at the end)
  private def insert(buf: Seq[Long], v: Long): Seq[Long] =
    if (buf.contains(v)) buf
    else if (buf.size < k) (buf :+ v).sorted
    else if (v < buf.last) (buf.init :+ v).sorted
    else buf

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
