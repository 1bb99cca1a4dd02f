package graft

import graft.io.Sinks
import org.apache.spark.sql.functions._
import java.util.Properties

/** JDBC sink/scan integration against embedded Derby (ships with Spark) —
  * the reference's MySQL mart append (K3) and dimension scan (S3)
  * exercised against a real JDBC engine. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("appendJdbc writes mart rows; readJdbc scans them back") {
    val mart = Seq(
      (1, "Customer#1", "2024-01", 410.25),
      (2, "Customer#2", "2024-01", 99.99),
      (1, "Customer#1", "2024-02", 12.00))
      .toDF("customer_id", "full_name", "sales_month", "total_sales")
    Sinks.appendJdbc(mart, url, "customers_data_mart", props)
    // append again — mode is Append, so rows accumulate (reference K3)
    Sinks.appendJdbc(mart.limit(1), url, "customers_data_mart", props)
    val back = Sinks.readJdbc(spark, url, "customers_data_mart", props)
    assert(back.count() === 4)
    assert(back.filter(col("customer_id") === 1).count() === 3)
    val total = back.agg(sum(col("total_sales").cast("decimal(18,2)")).cast("double"))
      .as[Double].head()
    assert(total === 410.25 + 99.99 + 12.00 + 410.25)
  }

  test("partitioned readJdbc splits the scan into parallel range queries") {
    val rows = (1 to 100).map(i => (i, s"name_$i", i * 2.0))
      .toDF("id", "name", "val")
    Sinks.appendJdbc(rows, url, "part_scan", props)
    val scanned = Sinks.readJdbc(spark, url, "part_scan", props,
      partitionOn = Some(("id", 1L, 100L, 4)))
    assert(scanned.rdd.getNumPartitions === 4)
    assert(scanned.count() === 100)
    assert(scanned.agg(sum("id")).as[Long].head() === 5050L)
  }

  test("write failures propagate instead of being swallowed") {
    val bad = Seq((1, "x")).toDF("a", "b")
    // table exists with an incompatible schema -> the JDBC write must throw
    intercept[Exception] {
      Sinks.appendJdbc(bad, url, "customers_data_mart", props)
    }
  }

  test("keyed JDBC upsert: argmax merge is idempotent, null keys rejected") {
    val t = "mart_upsert"
    val keys = Seq("user_id", "event_type")
    def snapshot: Set[(Long, String, Long, Double)] =
      Sinks.readJdbc(spark, url, t, props)
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
        .as[(Long, String, Long, Double)].collect().toSet
    val b1 = Seq(
      (1L, "click", 10L, 1.0),
      (1L, "click", 12L, 2.0), // same key, higher version: wins in-batch
      (2L, "view", 5L, 7.0))
      .toDF("user_id", "event_type", "event_id", "value")
    Sinks.upsertLatestJdbc(b1, url, t, keys, "event_id", props)
    assert(snapshot === Set((1L, "click", 12L, 2.0), (2L, "view", 5L, 7.0)))
    val b2 = Seq(
      (1L, "click", 11L, 9.9), // STALE vs stored version 12: must lose
      (2L, "view", 8L, 8.0),   // newer: wins
      (3L, "click", 1L, 3.0))  // new key: inserted
      .toDF("user_id", "event_type", "event_id", "value")
    Sinks.upsertLatestJdbc(b2, url, t, keys, "event_id", props)
    val s2 = snapshot
    assert(s2 === Set((1L, "click", 12L, 2.0), (2L, "view", 8L, 8.0),
      (3L, "click", 1L, 3.0)))
    // idempotence: re-applying the SAME batch (checkpoint replay after a
    // crash) must be a no-op — the property that stands in for sink
    // transactionality on a non-transactional streaming JDBC sink
    Sinks.upsertLatestJdbc(b2, url, t, keys, "event_id", props)
    assert(snapshot === s2)
    // null key / null version fail loudly (silent loss otherwise)
    val nullKey = Seq((Option.empty[Long], "click", Option(99L), 1.0))
      .toDF("user_id", "event_type", "event_id", "value")
    intercept[Exception] {
      Sinks.upsertLatestJdbc(nullKey, url, t, keys, "event_id", props)
    }
    val nullVersion = Seq((Option(9L), "click", Option.empty[Long], 1.0))
      .toDF("user_id", "event_type", "event_id", "value")
    intercept[Exception] {
      Sinks.upsertLatestJdbc(nullVersion, url, t, keys, "event_id", props)
    }
    // and the failed applies left the table untouched
    assert(snapshot === s2)
  }

  private def exec(sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url, props)
    try { val st = c.createStatement(); try { st.executeUpdate(sql); () } finally st.close() }
    finally c.close()
  }

  test("upsert staging swap: a crash between drop and rename is healed on replay") {
    val t = "mart_crash"
    val keys = Seq("user_id")
    def snapshot: Set[(Long, Long, Double)] =
      Sinks.readJdbc(spark, url, t, props)
        .select(col("user_id"), col("event_id"), col("value"))
        .as[(Long, Long, Double)].collect().toSet
    val b1 = Seq((1L, 10L, 1.0), (2L, 5L, 7.0)).toDF("user_id", "event_id", "value")
    Sinks.upsertLatestJdbc(b1, url, t, keys, "event_id", props)
    assert(snapshot === Set((1L, 10L, 1.0), (2L, 5L, 7.0)))
    // reproduce the one exposed crash window: the COMPLETE merged
    // snapshot sits in staging and the live table is already gone
    // (equivalent state: rename live out to staging)
    exec(s"RENAME TABLE $t TO ${t}_stg")
    assert(!Sinks.jdbcTableExists(url, t, props))
    // replaying the NEXT batch must first promote staging (else key 2,
    // absent from b2, would be lost forever), then merge normally
    val b2 = Seq((1L, 12L, 2.0), (3L, 1L, 3.0)).toDF("user_id", "event_id", "value")
    Sinks.upsertLatestJdbc(b2, url, t, keys, "event_id", props)
    assert(snapshot === Set((1L, 12L, 2.0), (2L, 5L, 7.0), (3L, 1L, 3.0)))
  }

  test("jdbcTableExists is not fooled by LIKE wildcards in the table name") {
    Sinks.appendJdbc(Seq((1, "x")).toDF("a", "b"), url, "wildXprobe", props)
    assert(Sinks.jdbcTableExists(url, "wildXprobe", props))
    // '_' is a LIKE wildcard: unescaped, "wild_probe" also matches
    // "wildXprobe" and the caller would read a nonexistent table
    assert(!Sinks.jdbcTableExists(url, "wild_probe", props))
  }
}
