package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def trades = Seq(
    (1L, 7L, ts("2024-01-01 10:00:30")),
    (2L, 7L, ts("2024-01-01 10:05:00")),
    (3L, 8L, ts("2024-01-01 10:00:10")),
    (4L, 9L, ts("2024-01-01 10:00:00"))) // no quotes for key 9
    .toDF("trade_id", "sym", "trade_ts")

  private def quotes = Seq(
    (100L, 7L, ts("2024-01-01 10:00:00")),
    (101L, 7L, ts("2024-01-01 10:00:20")),
    (102L, 7L, ts("2024-01-01 10:07:00")), // after both trades
    (103L, 8L, ts("2024-01-01 09:59:59")))
    .toDF("quote_id", "sym", "quote_ts")

  test("nearestPrior picks the greatest right ts <= left ts, null when none") {
    val got = AsOfJoin.nearestPrior(trades, quotes, "trade_id", "sym",
      "trade_ts", "quote_ts", Seq("quote_id"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Long]("quote_id")).map(_.toLong)).toMap
    assert(got(1L) === Some(101L)) // 10:00:20, not 10:00:00 and not 10:07
    assert(got(2L) === Some(101L))
    assert(got(3L) === Some(103L))
    assert(got(4L) === None)
  }

  test("bucketed variant equals exact within the horizon") {
    val exact = AsOfJoin.nearestPrior(trades, quotes, "trade_id", "sym",
      "trade_ts", "quote_ts", Seq("quote_id"))
    val bucketed = AsOfJoin.nearestPriorBucketed(trades, quotes, "trade_id", "sym",
      "trade_ts", "quote_ts", Seq("quote_id"), horizonSec = 3600, bucketSec = 60)
    assert(exact.exceptAll(bucketed).isEmpty && bucketed.exceptAll(exact).isEmpty)
  }

  test("bucketed variant drops matches beyond the horizon") {
    val bucketed = AsOfJoin.nearestPriorBucketed(trades, quotes, "trade_id", "sym",
      "trade_ts", "quote_ts", Seq("quote_id"), horizonSec = 15, bucketSec = 5)
    val got = bucketed.collect().map(r => r.getAs[Long]("trade_id") ->
      Option(r.getAs[java.lang.Long]("quote_id")).map(_.toLong)).toMap
    assert(got(1L) === Some(101L)) // 10 s back: within horizon
    assert(got(2L) === None)       // nearest quote 280 s back: beyond 15 s
    assert(got(3L) === Some(103L)) // 11 s back
  }
}
