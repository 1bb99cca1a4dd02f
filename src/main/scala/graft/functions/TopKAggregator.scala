package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed top-k aggregator: keeps the k highest (score, id) pairs with
  * deterministic (score desc, id asc) ordering.
  *
  * This is the scale-correct alternative to `row_number().over(Window
  * .partitionBy(q))` top-k: the window form shuffles and SORTS every
  * candidate row per query; the aggregator keeps a bounded k-element
  * buffer, merges partial buffers map-side, and shuffles at most k rows
  * per (query, map task). On an all-pairs ANN at cluster scale that is
  * the difference between a full candidate sort and a streaming fold.
  */
case class ScoredId(score: Double, id: Long)

class TopKAggregator(k: Int)
  extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  // ascending "badness": the WORST kept element sits at the head
  private def worseThan(a: ScoredId, b: ScoredId): Boolean =
    a.score < b.score || (a.score == b.score && a.id > b.id)

  private def insert(buf: Seq[ScoredId], v: ScoredId): Seq[ScoredId] =
    if (buf.size < k) (buf :+ v).sortWith(worseThan)
    else if (worseThan(buf.head, v)) (buf.tail :+ v).sortWith(worseThan)
    else buf

  override def zero: Seq[ScoredId] = Seq.empty
  override def reduce(buf: Seq[ScoredId], v: ScoredId): Seq[ScoredId] = insert(buf, v)
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    b.foldLeft(a)(insert)
  /** Final order: best first (score desc, id asc). */
  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] =
    buf.sortBy(s => (-s.score, s.id))
  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** String-keyed variant of [[TopKAggregator]] (score desc, id asc). */
case class ScoredStr(score: Double, id: String)

class TopKStrAggregator(k: Int)
  extends Aggregator[ScoredStr, Seq[ScoredStr], Seq[ScoredStr]] {

  private def worseThan(a: ScoredStr, b: ScoredStr): Boolean =
    a.score < b.score || (a.score == b.score && a.id > b.id)

  private def insert(buf: Seq[ScoredStr], v: ScoredStr): Seq[ScoredStr] =
    if (buf.size < k) (buf :+ v).sortWith(worseThan)
    else if (worseThan(buf.head, v)) (buf.tail :+ v).sortWith(worseThan)
    else buf

  override def zero: Seq[ScoredStr] = Seq.empty
  override def reduce(buf: Seq[ScoredStr], v: ScoredStr): Seq[ScoredStr] = insert(buf, v)
  override def merge(a: Seq[ScoredStr], b: Seq[ScoredStr]): Seq[ScoredStr] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[ScoredStr]): Seq[ScoredStr] =
    buf.sortBy(s => (-s.score, s.id))
  override def bufferEncoder: Encoder[Seq[ScoredStr]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredStr]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAggregator {
  /** Column form: `top_k(score, id)` usable in groupBy().agg(...). */
  def top_k(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[ScoredId])
      .apply(score, id)

  /** String-id column form. */
  def top_k_str(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKStrAggregator(k), Encoders.product[ScoredStr])
      .apply(score, id)
}
