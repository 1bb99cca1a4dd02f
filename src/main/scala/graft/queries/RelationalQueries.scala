package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational coverage beyond the reference's inner-join/window core:
  * full outer join, a selective multiway fact join with top-k, bounded
  * sliding and range window frames, and keyed first-event dedup (the
  * batch analogue of streaming dropDuplicatesWithinWatermark).
  *
  * Scale notes are per query; all money sums follow the exact-decimal
  * rule (CAST to DECIMAL(18,2) before SUM, DOUBLE after) so partial
  * aggregation order can never move a cent.
  */
object RelationalQueries {

  /** q38 — full outer join of the customer dimension against per-customer
    * order aggregates. Preserves both unmatched sides (dimension rows
    * with no facts, facts referencing no dimension row) — the join form
    * the reference's inner-only star join silently cannot express.
    * The aggregate side is grouped BEFORE the join, so the shuffle moves
    * one row per customer, not one per order. */
  def q38FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("spend"))
    Tables.customer(spark, dir)
      .join(perCust, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        round(coalesce(col("spend"), lit(0.0)), 2).as("spend"),
        col("c_custkey").isNull.as("orphan_orders"),
        col("o_custkey").isNull.as("no_orders"))
  }

  val q38Sql: String =
    """WITH pc AS (
      |  SELECT o_custkey, COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |  FROM orders GROUP BY o_custkey)
      |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name,
      |  coalesce(n_orders, 0) AS n_orders,
      |  round(coalesce(spend, 0.0), 2) AS spend,
      |  (c_custkey IS NULL) AS orphan_orders,
      |  (o_custkey IS NULL) AS no_orders
      |FROM customer FULL OUTER JOIN pc ON c_custkey = o_custkey""".stripMargin

  /** q39 — selective three-way fact join with top-k (TPC-H Q3 shape):
    * segment-filtered customers ⋈ date-filtered orders ⋈ lineitem,
    * revenue per open order, top 10. The plan to want at 100 TB: both
    * filters reach their parquet scans (PushedFilters), the filtered
    * customer side broadcasts into orders, only the surviving orderkeys
    * shuffle against lineitem, and the final top-k is a
    * TakeOrderedAndProject — no global sort.
    * Revenue is exact: price and (1 - discount) each cast to decimal
    * before the multiply, so the per-row product and the sum are both
    * associative decimal arithmetic. */
  def q39MultiwayTopK(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ords = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= cutoff)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)) - col("l_discount").cast("decimal(9,4)")))
          .as("rev"))
    ords.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"),
        substring(col("o_orderdate").cast("string"), 1, 10).as("order_date"),
        col("o_orderpriority"))
      .agg(round(sum(col("rev")).cast("double"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  val q39Sql: String =
    """SELECT o_orderkey,
      |  substring(CAST(o_orderdate AS VARCHAR), 1, 10) AS order_date,
      |  o_orderpriority,
      |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (1 - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE), 2) AS revenue
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate >= TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  /** q40 — bounded window frames over the per-customer order timeline:
    * a 4-row sliding spend (ROWS BETWEEN 3 PRECEDING) and a 30-day
    * range frame (RANGE over an integer epoch-day key — Spark range
    * frames require a numeric order column, and the integer key also
    * sidesteps ns-vs-us timestamp comparison between engines). Bounded
    * frames evaluate in one pass over each sorted partition — state is
    * the frame, not the partition, so a hot customer costs memory
    * proportional to the frame only. */
  def q40SlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    val epochDay = datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        epochDay.as("epoch_day"))
    val wRows = Window.partitionBy(col("o_custkey"))
      .orderBy(col("epoch_day").asc, col("o_orderkey").asc)
      .rowsBetween(-3, Window.currentRow)
    val wRange = Window.partitionBy(col("o_custkey"))
      .orderBy(col("epoch_day").asc)
      .rangeBetween(-30, Window.currentRow)
    base.select(col("o_orderkey"), col("o_custkey"), col("epoch_day"),
      round(sum(col("price")).over(wRows).cast("double"), 2).as("spend_last4"),
      count(lit(1)).over(wRange).as("n_orders_30d"),
      round(sum(col("price")).over(wRange).cast("double"), 2).as("spend_30d"))
  }

  val q40Sql: String =
    """WITH b AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
      |    date_diff('day', DATE '1970-01-01', o_orderdate) AS epoch_day
      |  FROM orders)
      |SELECT o_orderkey, o_custkey, epoch_day,
      |  round(CAST(SUM(price) OVER (PARTITION BY o_custkey
      |    ORDER BY epoch_day ASC, o_orderkey ASC
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
      |    AS spend_last4,
      |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch_day ASC
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_orders_30d,
      |  round(CAST(SUM(price) OVER (PARTITION BY o_custkey
      |    ORDER BY epoch_day ASC
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
      |    AS spend_30d
      |FROM b""".stripMargin

  /** q41 — keyed first-event dedup per hour: one surviving event per
    * (user, event_type, hour), earliest timestamp wins, earliest
    * event_id on ties. This is the batch analogue of Structured
    * Streaming's dropDuplicatesWithinWatermark (the streaming form is
    * exercised in EventsStream/StreamingSpec); the groupBy form does it
    * with map-side partial aggregation — the shuffle carries one row
    * per surviving key, not one per event. */
  def q41EventDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        substring(date_trunc("hour", col("ts")).cast("string"), 1, 13).as("hour"),
        col("user_id"), col("event_type"))
      .agg(min(struct(col("ts"), col("event_id"))).as("f"),
        count(lit(1)).as("n_events"))
      .select(col("hour"), col("user_id"), col("event_type"),
        col("f.event_id").as("first_event_id"),
        (col("n_events") - 1).as("n_dropped"))

  val q41Sql: String =
    """WITH r AS (
      |  SELECT substring(CAST(date_trunc('hour', ts) AS VARCHAR), 1, 13)
      |      AS hour,
      |    user_id, event_type, event_id,
      |    row_number() OVER (PARTITION BY
      |        substring(CAST(date_trunc('hour', ts) AS VARCHAR), 1, 13),
      |        user_id, event_type
      |      ORDER BY ts ASC, event_id ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY
      |        substring(CAST(date_trunc('hour', ts) AS VARCHAR), 1, 13),
      |        user_id, event_type) AS n_events
      |  FROM events)
      |SELECT hour, user_id, event_type, event_id AS first_event_id,
      |  n_events - 1 AS n_dropped
      |FROM r WHERE rn = 1""".stripMargin

  /** q44 — dense global ids without a global sort: bucketed prefix-sum
    * numbering (ops.Ids). The oracle IS the global window the operator
    * avoids — fine for DuckDB at verification scale, the anti-pattern
    * the operator exists to dodge at 100 TB. */
  def q44GlobalIds(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Ids.contiguousIds(
        Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
        orderCol = col("n_chars"), tieCol = col("doc_id"), bucketWidth = 16)
      .select(col("doc_id"), col("n_chars"), col("global_id"))

  val q44Sql: String =
    """SELECT doc_id, n_chars,
      |  row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS global_id
      |FROM documents""".stripMargin

  /** q45 — small-file compaction round trip: compact the documents table
    * to size-targeted files (io.Sinks.compactParquet), read the result
    * back, and prove bit-for-bit content conservation against the
    * original table (the q36 round-trip pattern, maintenance-op
    * edition). */
  def q45Compaction(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.io.TempPaths.scratchDir(spark, "graft_q45", dir)
    graft.io.Sinks.compactParquet(spark, s"$dir/documents.parquet", out)
    spark.read.parquet(out).select(col("doc_id"), col("source"), col("n_chars"))
  }

  /** q46 — dense global ids over a SPARSE order key (a 32-bit content
    * hash): the case where q44's fixed-width range bucketing degenerates
    * (every row its own bucket). The quantile-bucketed variant bounds
    * the offsets table at numBuckets rows regardless of key range. The
    * oracle is again the global window the operator avoids. */
  def q46GlobalIdsSparse(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"),
      conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
        .as("sort_key"))
    graft.ops.Ids.contiguousIdsQuantile(
        docs, orderCol = col("sort_key"), tieCol = col("doc_id"),
        numBuckets = 64)
      .select(col("doc_id"), col("sort_key"), col("global_id"))
  }

  val q46Sql: String =
    """SELECT doc_id,
      |  CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) AS sort_key,
      |  row_number() OVER (
      |    ORDER BY CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT),
      |      doc_id) - 1 AS global_id
      |FROM documents""".stripMargin

  val q45Sql: String =
    "SELECT doc_id, source, n_chars FROM documents"

  /** q50 — z-order clustered layout round trip: orders are written
    * range-partitioned + sorted on the Morton interleave of
    * (customer, order-day), the two-dimensional locality key that lets
    * parquet min/max stats prune scans filtered on EITHER dimension.
    * RelationalSpec asserts the written files carry disjoint z-ranges
    * (the skippability property); the oracle replays the interleave
    * arithmetic and checks the values survive the round trip. */
  def q50ZOrderLayout(spark: SparkSession, dir: String): DataFrame = {
    val zed = Tables.orders(spark, dir).select(
        col("o_orderkey"),
        pmod(col("o_custkey"), lit(65536L)).as("ck"),
        pmod(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"),
          lit(65536L)).as("ed"))
      .withColumn("zval", graft.ops.ZOrder.zValue(col("ck"), col("ed")))
      .select(col("o_orderkey"), col("zval"))
    val out = graft.io.TempPaths.scratchDir(spark, "graft_q50", dir)
    zed.repartitionByRange(8, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
  }

  val q50Sql: String = {
    val terms = (0 until 16).map(i =>
      s"(((ck >> $i) & 1) << ${2 * i}) + (((ed >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
    s"""WITH z AS (
       |  SELECT o_orderkey, o_custkey % 65536 AS ck,
       |    (CAST(o_orderdate AS DATE) - DATE '1992-01-01') % 65536 AS ed
       |  FROM orders)
       |SELECT o_orderkey, CAST($terms AS BIGINT) AS zval FROM z""".stripMargin
  }

  /** q55 — THREE-dimensional z-order layout (ZOrder.zValueN): customer,
    * order-day, and order-key-suffix interleaved at 16 bits each (48-bit
    * code). With the layout range-partitioned on the code, the top code
    * bits are the top bits of ALL THREE dimensions, so a selective
    * predicate on any one of them — including the third — touches only
    * the files whose z-range can contain it (RelationalSpec asserts
    * disjoint file ranges and third-dimension file skipping). The
    * oracle replays the 3-way interleave arithmetic. */
  def q55ZOrder3(spark: SparkSession, dir: String): DataFrame = {
    val zed = Tables.orders(spark, dir).select(
        col("o_orderkey"),
        pmod(col("o_custkey"), lit(65536L)).as("ck"),
        pmod(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"),
          lit(65536L)).as("ed"),
        pmod(col("o_orderkey"), lit(65536L)).as("pk"))
      .withColumn("zval",
        graft.ops.ZOrder.zValueN(Seq(col("ck"), col("ed"), col("pk")), 16))
      .select(col("o_orderkey"), col("zval"))
    val out = graft.io.TempPaths.scratchDir(spark, "graft_q55", dir)
    zed.repartitionByRange(8, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
  }

  val q55Sql: String = {
    val terms = (0 until 16).map(i =>
      s"(((ck >> $i) & 1) << ${3 * i}) + (((ed >> $i) & 1) << ${3 * i + 1}) + " +
        s"(((pk >> $i) & 1) << ${3 * i + 2})")
      .mkString(" + ")
    s"""WITH z AS (
       |  SELECT o_orderkey, o_custkey % 65536 AS ck,
       |    (CAST(o_orderdate AS DATE) - DATE '1992-01-01') % 65536 AS ed,
       |    o_orderkey % 65536 AS pk
       |  FROM orders)
       |SELECT o_orderkey, CAST($terms AS BIGINT) AS zval FROM z""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_full_outer" -> (q38FullOuter _),
    "q39_multiway_topk" -> (q39MultiwayTopK _),
    "q40_sliding_window" -> (q40SlidingWindow _),
    "q41_event_dedup" -> (q41EventDedup _),
    "q44_global_ids" -> (q44GlobalIds _),
    "q45_compaction" -> (q45Compaction _),
    "q46_global_ids_sparse" -> (q46GlobalIdsSparse _),
    "q50_zorder_layout" -> (q50ZOrderLayout _),
    "q55_zorder3" -> (q55ZOrder3 _))

  val oracles: Map[String, String] = Map(
    "q38_full_outer" -> q38Sql,
    "q39_multiway_topk" -> q39Sql,
    "q40_sliding_window" -> q40Sql,
    "q41_event_dedup" -> q41Sql,
    "q44_global_ids" -> q44Sql,
    "q45_compaction" -> q45Sql,
    "q46_global_ids_sparse" -> q46Sql,
    "q50_zorder_layout" -> q50Sql,
    "q55_zorder3" -> q55Sql)
}
