package graft.queries

import graft.Tables
import graft.enrich.StarJoin
import graft.marts.Marts
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational query catalog: every reference operator family
  * (SURVEY.md §2) expressed over the driver testdata star schema, each
  * paired with ANSI SQL the DuckDB oracle replays on the same parquet.
  *
  * Conventions shared by query + oracle (hash-parity critical):
  *   - money sums: CAST to DECIMAL(18,2) before SUM (exact, associative),
  *     CAST the result to DOUBLE for the output schema;
  *   - month keys: substring(cast(ts as string),1,7) — string slicing,
  *     reference-faithful (SURVEY.md §7.5c);
  *   - every computed column aliased identically on both sides.
  */
object CoreQueries {

  /** q01 — ingest normalization: extra columns collapsed into one
    * `additional_column` string (reference main.py:192-200). The lineitem
    * "mandatory" projection plays the 8-column sales fact; returnflag/
    * linestatus/tax play the drifted extras.
    */
  def q01IngestNormalize(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("customer_id"), col("l_partkey").as("store_id"),
      col("l_suppkey").as("product_key"), col("l_quantity").as("quantity"),
      col("l_extendedprice").as("price"), col("l_shipdate").cast("string").as("sales_date"),
      col("l_returnflag"), col("l_linestatus"))
    // mirror SalesIngest.normalize over this shape
    li.withColumn("additional_column", concat_ws(", ", col("l_returnflag"), col("l_linestatus")))
      .select("customer_id", "store_id", "product_key", "quantity", "price",
        "sales_date", "additional_column")
  }

  val q01Sql: String =
    """SELECT l_orderkey AS customer_id, l_partkey AS store_id,
      |  l_suppkey AS product_key, l_quantity AS quantity,
      |  l_extendedprice AS price, CAST(l_shipdate AS VARCHAR) AS sales_date,
      |  concat_ws(', ', l_returnflag, l_linestatus) AS additional_column
      |FROM lineitem""".stripMargin

  /** q02 — star enrichment: fact inner-joined through 3 broadcast dims
    * (reference dimension_tables_join.py:17-54). */
  def q02StarJoin(spark: SparkSession, dir: String): DataFrame =
    StarJoin.enrichLineitem(Tables.lineitem(spark, dir), Tables.supplier(spark, dir),
        Tables.nation(spark, dir), Tables.region(spark, dir))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("s_name").as("supplier_name"),
        col("n_name").as("nation_name"), col("r_name").as("region_name"))

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  s_name AS supplier_name, n_name AS nation_name, r_name AS region_name
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey""".stripMargin

  /** q03 — FLAGSHIP: customer mart, monthly totals per customer
    * (reference customer_mart_sql_tranform_write.py:9-19), grouped form. */
  def q03CustomerMart(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = broadcast(Tables.customer(spark, dir))
    Marts.customerMartGrouped(
      o.join(c, o("o_custkey") === c("c_custkey"), "inner"),
      col("o_custkey"), col("c_name"), col("o_orderdate"), col("o_totalprice"))
  }

  val q03Sql: String =
    """SELECT o_custkey AS customer_id, c_name AS full_name,
      |  substring(CAST(o_orderdate AS VARCHAR), 1, 7) AS sales_month,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2, 3""".stripMargin

  /** q04 — sales mart: per-(store,person,month) totals, rank() within
    * (store,month), 1% incentive for rank 1 with tie semantics preserved
    * (reference sales_data_mart_sql_transform.py:8-26). supplier.s_nationkey
    * plays store, l_suppkey plays salesperson. */
  def q04SalesMart(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val s = broadcast(Tables.supplier(spark, dir))
    Marts.salesMart(li.join(s, li("l_suppkey") === s("s_suppkey"), "inner"),
      col("s_nationkey"), col("l_suppkey"), col("s_name"),
      col("l_shipdate"), col("l_extendedprice"))
  }

  val q04Sql: String =
    """WITH totals AS (
      |  SELECT s_nationkey AS store_id, l_suppkey AS sales_person_id,
      |    s_name AS full_name,
      |    substring(CAST(l_shipdate AS VARCHAR), 1, 7) AS sales_month,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS total_dec
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2, 3, 4),
      |ranked AS (
      |  SELECT *, rank() OVER (PARTITION BY store_id, sales_month
      |                         ORDER BY total_dec DESC) AS rnk
      |  FROM totals)
      |SELECT store_id, sales_person_id, full_name, sales_month,
      |  CAST(total_dec AS DOUBLE) AS total_sales,
      |  CAST(CASE WHEN rnk = 1 THEN round(total_dec * 0.01, 2) ELSE 0 END AS DOUBLE)
      |    AS incentive
      |FROM ranked""".stripMargin

  /** q05 — the reference's window-sum + distinct() idiom, verbatim shape
    * (SURVEY.md §2.5 A1: full-partition frame, no ORDER BY, then distinct). */
  def q05WindowDistinct(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("sales_month", Marts.monthKey(col("o_orderdate")))
    val w = Window.partitionBy(col("o_custkey"), col("sales_month"))
    o.withColumn("total_sales",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select(col("o_custkey").as("customer_id"), col("sales_month"), col("total_sales"))
      .distinct()
  }

  val q05Sql: String =
    """SELECT DISTINCT o_custkey AS customer_id,
      |  substring(CAST(o_orderdate AS VARCHAR), 1, 7) AS sales_month,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |       OVER (PARTITION BY o_custkey,
      |             substring(CAST(o_orderdate AS VARCHAR), 1, 7)) AS DOUBLE)
      |    AS total_sales
      |FROM orders""".stripMargin

  /** q06 — union accumulation (reference main.py:204); the canonical-order
    * select makes positional union safe; we use unionByName. */
  def q06Union(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val open = o.filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val rest = o.filter(col("o_orderstatus") =!= "O")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    open.unionByName(rest)
  }

  val q06Sql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus <> 'O'""".stripMargin

  /** q07 — filter + narrow projection; predicate and column pruning reach
    * the parquet scan (asserted in ExplainSpec). The reference never calls
    * df.filter (SURVEY.md §2.3 P5) — this surfaces the implied capability. */
  def q07FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 30 && col("l_discount") <= 0.04)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))

  val q07Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      |FROM lineitem WHERE l_quantity >= 30 AND l_discount <= 0.04""".stripMargin

  /** q08 — full groupBy().agg() surface: sum/min/max/count + derived
    * averages (TPC-H Q1 shape). Averages are exact-decimal sums divided by
    * counts, double at the end — identical bits on both engines. */
  def q08GroupByAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
             (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)"))))
          .cast("double").as("sum_disc_price"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))

  val q08Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** q09 — top-k: global orderBy + limit compiles to TakeOrderedAndProject
    * (per-partition top-k, no global sort shuffle). Deterministic tiebreak
    * on the key so LIMIT is well-defined on both engines. */
  def q09TopK(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = broadcast(Tables.customer(spark, dir))
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(Marts.moneySum(col("o_totalprice")).as("total_spend"))
      .orderBy(col("total_spend").desc, col("c_custkey").asc)
      .limit(10)
  }

  val q09Sql: String =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2 ORDER BY total_spend DESC, c_custkey ASC LIMIT 10""".stripMargin

  /** q10 — left-semi join (EXISTS): customers that placed orders. */
  def q10SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)""".stripMargin

  /** q11 — left-anti join (NOT EXISTS): orders with no line items
    * (non-empty on the fixtures, unlike customers-without-orders). */
  def q11AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
  }

  val q11Sql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o.o_orderkey)""".stripMargin

  /** q12 — conditional expressions: when/otherwise + decimal round
    * (reference sales mart incentive, SURVEY.md §2.6 W2). */
  def q12Conditional(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"),
      when(col("o_totalprice") > 200000,
        round(col("o_totalprice").cast("decimal(18,2)") * lit(BigDecimal("0.01")), 2))
        .otherwise(lit(0)).cast("double").as("big_order_bonus"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit("hot"))
        .otherwise(lit("cold")).as("heat"))

  val q12Sql: String =
    """SELECT o_orderkey, o_orderstatus,
      |  CAST(CASE WHEN o_totalprice > 200000
      |            THEN round(CAST(o_totalprice AS DECIMAL(18,2)) * 0.01, 2)
      |            ELSE 0 END AS DOUBLE) AS big_order_bonus,
      |  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
      |       ELSE 'cold' END AS heat
      |FROM orders""".stripMargin

  /** q13 — scalar function surface: concat/substring/upper/lower/length/
    * round (SURVEY.md §2.9), all codegen'd built-ins. */
  def q13Scalars(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      concat(col("c_name"), lit(" "), col("c_mktsegment")).as("tagged_name"),
      upper(col("c_mktsegment")).as("segment_upper"),
      lower(col("c_name")).as("name_lower"),
      substring(col("c_name"), 1, 10).as("name_prefix"),
      length(col("c_name")).as("name_len"),
      round(col("c_acctbal").cast("decimal(18,2)") * lit(BigDecimal("1.10")), 2)
        .cast("double").as("boosted_bal"))

  val q13Sql: String =
    """SELECT c_custkey,
      |  concat(c_name, ' ', c_mktsegment) AS tagged_name,
      |  upper(c_mktsegment) AS segment_upper,
      |  lower(c_name) AS name_lower,
      |  substring(c_name, 1, 10) AS name_prefix,
      |  length(c_name) AS name_len,
      |  CAST(round(CAST(c_acctbal AS DECIMAL(18,2)) * 1.10, 2) AS DOUBLE) AS boosted_bal
      |FROM customer""".stripMargin

  /** q14 — event-time tumbling aggregation (batch form of the streaming
    * pipeline in graft.streaming): hourly counts + exact sums per type. */
  def q14EventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // string hour key, 'YYYY-MM-DD HH': avoids ns-vs-us timestamp
      // representation mismatches between engines
      .groupBy(substring(date_trunc("hour", col("ts")).cast("string"), 1, 13).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  val q14Sql: String =
    """SELECT substring(CAST(date_trunc('hour', ts) AS VARCHAR), 1, 13) AS hour,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Catalog wiring for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_ingest_normalize" -> (q01IngestNormalize _),
    "q02_star_join" -> (q02StarJoin _),
    "q03_customer_mart" -> (q03CustomerMart _),
    "q04_sales_mart" -> (q04SalesMart _),
    "q05_window_distinct" -> (q05WindowDistinct _),
    "q06_union" -> (q06Union _),
    "q07_filter_project" -> (q07FilterProject _),
    "q08_groupby_agg" -> (q08GroupByAgg _),
    "q09_topk" -> (q09TopK _),
    "q10_semi_join" -> (q10SemiJoin _),
    "q11_anti_join" -> (q11AntiJoin _),
    "q12_conditional" -> (q12Conditional _),
    "q13_scalars" -> (q13Scalars _),
    "q14_events_hourly" -> (q14EventsHourly _))

  val oracles: Map[String, String] = Map(
    "q01_ingest_normalize" -> q01Sql,
    "q02_star_join" -> q02Sql,
    "q03_customer_mart" -> q03Sql,
    "q04_sales_mart" -> q04Sql,
    "q05_window_distinct" -> q05Sql,
    "q06_union" -> q06Sql,
    "q07_filter_project" -> q07Sql,
    "q08_groupby_agg" -> q08Sql,
    "q09_topk" -> q09Sql,
    "q10_semi_join" -> q10Sql,
    "q11_anti_join" -> q11Sql,
    "q12_conditional" -> q12Sql,
    "q13_scalars" -> q13Sql,
    "q14_events_hourly" -> q14Sql)
}
