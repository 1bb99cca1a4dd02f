package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance catalog: the mutation patterns a long-lived
  * dimensional store needs on top of the read-side operators — SCD
  * Type-2 history build, MERGE-style upsert, and a data-quality audit
  * gate. All are expressed as pure DataFrame plans (no table format
  * required), so the same shapes run against parquet, Hive layouts, or
  * a lakehouse table format's staging reads.
  *
  * Scale notes: the SCD2 build is a single narrow pass (no join — the
  * change detection is a predicate, version rows union on), the upsert
  * is one shuffle-on-key full outer join (bucket both sides on the
  * merge key to make it exchange-free; see io.Bucketing), and each
  * audit check is an independent aggregate the scheduler can run
  * concurrently; the referential checks broadcast the dim-key side
  * when small and fall back to shuffle semi/anti joins.
  */
object WarehouseQueries {

  // ---------------------------------------------------------------------
  // q47 — SCD Type-2 dimension history
  // ---------------------------------------------------------------------

  /** Build the Type-2 history of applying a deterministic change batch
    * (every 7th customer moves segment and gains a 100.00 credit) to the
    * customer dimension at effective date 20260101: changed keys close
    * their v1 row (valid_to = effective, is_current = false) and open a
    * v2 row; unchanged keys keep an open v1 row. */
  def q47Scd2History(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val changed = col("c_custkey") % 7 === 0
    val openEnd = lit(99991231L)
    val eff = lit(20260101L)
    val v1 = cust.select(
      col("c_custkey"),
      lit(1L).as("version"),
      lit(0L).as("valid_from"),
      when(changed, eff).otherwise(openEnd).as("valid_to"),
      (!changed).as("is_current"),
      col("c_acctbal").as("acctbal"),
      col("c_mktsegment").as("mktsegment"))
    val v2 = cust.filter(changed).select(
      col("c_custkey"),
      lit(2L).as("version"),
      eff.as("valid_from"),
      openEnd.as("valid_to"),
      lit(true).as("is_current"),
      (col("c_acctbal").cast("decimal(18,2)") +
        expr("CAST(100.00 AS DECIMAL(18,2))")).cast("double").as("acctbal"),
      lit("MOVED").as("mktsegment"))
    v1.unionByName(v2)
  }

  val q47Sql: String =
    """SELECT c_custkey, CAST(1 AS BIGINT) AS version,
      |  CAST(0 AS BIGINT) AS valid_from,
      |  CAST(CASE WHEN c_custkey % 7 = 0 THEN 20260101
      |       ELSE 99991231 END AS BIGINT) AS valid_to,
      |  c_custkey % 7 <> 0 AS is_current,
      |  c_acctbal AS acctbal, c_mktsegment AS mktsegment
      |FROM customer
      |UNION ALL
      |SELECT c_custkey, CAST(2 AS BIGINT), CAST(20260101 AS BIGINT),
      |  CAST(99991231 AS BIGINT), TRUE,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) +
      |       CAST(100.00 AS DECIMAL(18,2)) AS DOUBLE),
      |  'MOVED'
      |FROM customer WHERE c_custkey % 7 = 0""".stripMargin

  // ---------------------------------------------------------------------
  // q48 — MERGE-style upsert (update matched / insert new / keep rest)
  // ---------------------------------------------------------------------

  /** MERGE INTO customer USING per-customer order spend: matched keys
    * add the spend to their balance, source keys with no target row
    * insert as new 'NEW'-segment customers (every 31st source key is
    * shifted out of the target key space so the insert branch is
    * non-trivially exercised), untouched target rows pass through. One
    * full outer join on the merge key — the canonical distributed MERGE
    * plan; bucket both sides on the key to run it exchange-free. */
  def q48MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val target = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"), col("c_acctbal"),
        col("c_mktsegment"))
    val source = Tables.orders(spark, dir)
      .select(
        when(col("o_custkey") % 31 === 0, col("o_custkey") + 1000000L)
          .otherwise(col("o_custkey")).as("custkey"),
        col("o_totalprice"))
      .groupBy(col("custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
    target.join(source, Seq("custkey"), "full_outer")
      .select(
        col("custkey"),
        when(col("c_acctbal").isNotNull && col("spend").isNotNull, "update")
          .when(col("c_acctbal").isNull, "insert")
          .otherwise("keep").as("action"),
        (coalesce(col("c_acctbal").cast("decimal(18,2)"),
            expr("CAST(0.00 AS DECIMAL(18,2))")) +
          coalesce(col("spend"), expr("CAST(0.00 AS DECIMAL(18,2))")))
          .cast("double").as("acctbal"),
        coalesce(col("c_mktsegment"), lit("NEW")).as("mktsegment"))
  }

  val q48Sql: String =
    """WITH src AS (
      |  SELECT CASE WHEN o_custkey % 31 = 0 THEN o_custkey + 1000000
      |         ELSE o_custkey END AS custkey,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      |  FROM orders GROUP BY 1),
      |tgt AS (SELECT c_custkey AS custkey, c_acctbal, c_mktsegment
      |        FROM customer)
      |SELECT coalesce(tgt.custkey, src.custkey) AS custkey,
      |  CASE WHEN tgt.custkey IS NOT NULL AND src.custkey IS NOT NULL
      |         THEN 'update'
      |       WHEN tgt.custkey IS NULL THEN 'insert'
      |       ELSE 'keep' END AS action,
      |  CAST(coalesce(CAST(c_acctbal AS DECIMAL(18,2)),
      |         CAST(0.00 AS DECIMAL(18,2))) +
      |       coalesce(spend, CAST(0.00 AS DECIMAL(18,2))) AS DOUBLE)
      |    AS acctbal,
      |  coalesce(c_mktsegment, 'NEW') AS mktsegment
      |FROM tgt FULL OUTER JOIN src ON tgt.custkey = src.custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q49 — data-quality audit gate
  // ---------------------------------------------------------------------

  /** One row per constraint check: row presence, null keys, key
    * uniqueness, referential integrity (orphan FK rows via anti joins),
    * and domain-range rules. The audit a pipeline runs before promoting
    * a batch; every check is an independent bounded aggregate. */
  def q49QualityAudit(spark: SparkSession, dir: String): DataFrame = {
    val spk = spark
    import spk.implicits._
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val customer = Tables.customer(spark, dir)
    def check(name: String, metric: DataFrame, passIfZero: Boolean): DataFrame =
      metric.select(lit(name).as("check"),
        col("metric").cast("long").as("metric"),
        (if (passIfZero) col("metric") === 0 else col("metric") > 0)
          .as("pass"))
    val rows = check("orders_rows",
      orders.agg(count(lit(1)).as("metric")), passIfZero = false)
    val nullKeys = check("orders_null_custkey",
      orders.agg(count(when(col("o_custkey").isNull, 1)).as("metric")),
      passIfZero = true)
    val dupKeys = check("orders_dup_orderkey",
      orders.agg((count(lit(1)) - count_distinct(col("o_orderkey")))
        .as("metric")), passIfZero = true)
    val orphanOrders = check("orders_orphan_custkey",
      orders.join(customer, orders("o_custkey") === customer("c_custkey"),
          "left_anti")
        .agg(count(lit(1)).as("metric")), passIfZero = true)
    val orphanLines = check("lineitem_orphan_orderkey",
      lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"),
          "left_anti")
        .agg(count(lit(1)).as("metric")), passIfZero = true)
    val priceRule = check("orders_nonpositive_price",
      orders.agg(count(when(col("o_totalprice") <= 0, 1)).as("metric")),
      passIfZero = true)
    val qtyRule = check("lineitem_qty_range",
      lineitem.agg(count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1))
        .as("metric")), passIfZero = true)
    rows.unionByName(nullKeys).unionByName(dupKeys).unionByName(orphanOrders)
      .unionByName(orphanLines).unionByName(priceRule).unionByName(qtyRule)
  }

  val q49Sql: String =
    """SELECT 'orders_rows' AS check, CAST(COUNT(*) AS BIGINT) AS metric,
      |  COUNT(*) > 0 AS pass FROM orders
      |UNION ALL
      |SELECT 'orders_null_custkey',
      |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 FROM orders
      |UNION ALL
      |SELECT 'orders_dup_orderkey',
      |  CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
      |  COUNT(*) = COUNT(DISTINCT o_orderkey) FROM orders
      |UNION ALL
      |SELECT 'orders_orphan_custkey', CAST(COUNT(*) AS BIGINT),
      |  COUNT(*) = 0
      |FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      |UNION ALL
      |SELECT 'lineitem_orphan_orderkey', CAST(COUNT(*) AS BIGINT),
      |  COUNT(*) = 0
      |FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |UNION ALL
      |SELECT 'orders_nonpositive_price',
      |  CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
      |  SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0 FROM orders
      |UNION ALL
      |SELECT 'lineitem_qty_range',
      |  CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
      |           THEN 1 ELSE 0 END) AS BIGINT),
      |  SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
      |      THEN 1 ELSE 0 END) = 0 FROM lineitem""".stripMargin

  // ---------------------------------------------------------------------
  // q53 — join-key skew diagnosis report
  // ---------------------------------------------------------------------

  /** The measurement that decides whether a join key needs salting /
    * AQE skew handling BEFORE the job melts an executor: per-key group
    * sizes reduced to distribution stats (max, quantiles, skew ratio).
    *
    * The quantiles are EXACT but bounded-state: instead of
    * `percentile(n, p)` — a single-group aggregate whose buffer holds
    * every one of the n_keys count values (at 100 TB the skew query
    * itself becomes the OOM) — the per-key counts collapse to a
    * histogram of group SIZES first. A histogram of d distinct sizes
    * over n_rows input rows satisfies d(d+1)/2 <= n_rows (each distinct
    * size appears at least once), so d <= sqrt(2*n_rows): ~1.4M rows at
    * a trillion input rows, a few MB. The cumulative-rank window over
    * that histogram then reads off the interpolated quantiles with
    * plain arithmetic — the same linear interpolation at h = p*(N-1)
    * that `percentile`/`quantile_cont` define, so the oracle is
    * unchanged. Quantiles round to 4 decimals: integer inputs
    * interpolate identically across engines well inside that
    * precision. */
  def q53SkewReport(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    // histogram of group sizes: d <= sqrt(2*n_rows) rows, so the
    // single-partition cumulative window below is bounded by data
    // volume, not key cardinality
    val hist = counts.groupBy(col("n")).agg(count(lit(1)).as("keys"))
    val wCum = Window.orderBy(col("n"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("n"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("cum", sum(col("keys")).over(wCum))
      .withColumn("nk", sum(col("keys")).over(wAll))
    // value at 0-indexed rank r of the sorted sizes = smallest n whose
    // cumulative key count exceeds r; h = p*(N-1), interpolate lo..hi
    def rankValue(rank: Column): Column =
      min(when(col("cum") > rank, col("n")))
    def h(p: Double): Column = (col("nk") - 1) * lit(p)
    cum.agg(
        max(col("nk")).as("n_keys"),
        sum(col("keys") * col("n")).as("n_rows"),
        max(col("n")).as("max_per_key"),
        rankValue(floor(h(0.5))).as("v50lo"),
        rankValue(ceil(h(0.5))).as("v50hi"),
        max(h(0.5) - floor(h(0.5))).as("f50"),
        rankValue(floor(h(0.99))).as("v99lo"),
        rankValue(ceil(h(0.99))).as("v99hi"),
        max(h(0.99) - floor(h(0.99))).as("f99"))
      .select(
        col("n_keys").cast("long").as("n_keys"),
        col("n_rows").cast("long").as("n_rows"),
        col("max_per_key").cast("long").as("max_per_key"),
        round(col("v50lo") +
          col("f50") * (col("v50hi") - col("v50lo")), 4).as("p50_per_key"),
        round(col("v99lo") +
          col("f99") * (col("v99hi") - col("v99lo")), 4).as("p99_per_key"),
        round(col("max_per_key") /
          (col("n_rows").cast("double") / col("n_keys")), 6).as("skew_ratio"))
  }

  val q53Sql: String =
    """WITH c AS (
      |  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey),
      |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
      |    CAST(SUM(n) AS BIGINT) AS n_rows,
      |    CAST(MAX(n) AS BIGINT) AS max_per_key,
      |    quantile_cont(n, 0.5) AS p50,
      |    quantile_cont(n, 0.99) AS p99
      |  FROM c)
      |SELECT n_keys, n_rows, max_per_key,
      |  round(p50, 4) AS p50_per_key,
      |  round(p99, 4) AS p99_per_key,
      |  round(max_per_key / (CAST(n_rows AS DOUBLE) / n_keys), 6)
      |    AS skew_ratio
      |FROM s""".stripMargin

  // ---------------------------------------------------------------------
  // q62 — schema evolution across write generations
  // ---------------------------------------------------------------------

  /** q62 — schema EVOLUTION: a long-lived table's early files were
    * written before a column existed (generation 1: doc_id, text_len),
    * later files carry it (generation 2: + source). `mergeSchema`
    * reconciles the generations at read time — old rows surface the new
    * column as null, no rewrite of historical files (at 100 TB,
    * "ALTER TABLE ADD COLUMN + backfill" is a compute bill; additive
    * evolution must be free). The oracle replays the generation split
    * with a NULL-padded UNION ALL. mergeSchema is a per-read opt-in
    * because reconciling N file footers has driver cost — production
    * pins the merged schema in a catalog; here the read IS the test. */
  def q62SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.io.TempPaths.scratchDir(spark, "graft_q62_tbl", dir)
    val docs = Tables.documents(spark, dir)
    // terminal marker, written only after BOTH generations landed: an
    // any-parquet guard would accept a gen-1-only dir left by a kill
    // between the two writes (TempPaths.isComplete)
    if (!graft.io.TempPaths.isComplete(out)) {
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
        .write.mode("overwrite").parquet(out)
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), length(col("text")).cast("long").as("text_len"),
          col("source"))
        .write.mode("append").parquet(out)
      graft.io.TempPaths.markComplete(out)
    }
    spark.read.option("mergeSchema", "true").parquet(out)
      .select(col("doc_id"), col("text_len"), col("source"))
  }

  val q62Sql: String =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len,
      |  NULL AS source
      |FROM documents WHERE doc_id % 2 = 0
      |UNION ALL
      |SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len, source
      |FROM documents WHERE doc_id % 2 = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_scd2_history" -> (q47Scd2History _),
    "q48_merge_upsert" -> (q48MergeUpsert _),
    "q49_quality_audit" -> (q49QualityAudit _),
    "q53_skew_report" -> (q53SkewReport _),
    "q62_schema_evolution" -> (q62SchemaEvolution _))

  val oracles: Map[String, String] = Map(
    "q47_scd2_history" -> q47Sql,
    "q48_merge_upsert" -> q48Sql,
    "q49_quality_audit" -> q49Sql,
    "q53_skew_report" -> q53Sql,
    "q62_schema_evolution" -> q62Sql)
}
