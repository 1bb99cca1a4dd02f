package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._

/** Event-analytics invariants: funnel monotonicity and cohort accounting. */
class EventSpec extends SparkSpec {

  test("parameterized funnel enforces strict ordering per stage") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // u1 full ordered path; u2 stops after click; u3 clicks with no view;
    // u4 purchases BEFORE clicking (so stage 3 must reject it)
    val ev = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      (2L, "view", t(1)), (2L, "click", t(5)),
      (3L, "click", t(2)),
      (4L, "view", t(1)), (4L, "purchase", t(2)), (4L, "click", t(4)))
      .toDF("user_id", "event_type", "ts")
    val got = EventQueries.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getAs[Long]("stage"), r.getAs[String]("stage_name"),
        r.getAs[Long]("n_users"))).sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "view", 3L),
      (2L, "click_after_view", 3L),
      (3L, "purchase_after_click", 1L)))
    // four-stage variant over the same engine: an extra stage with no
    // qualifying events yields zero, not a missing row
    val got4 = EventQueries.funnel(ev, Seq("view", "click", "purchase", "refund"))
      .collect().sortBy(_.getAs[Long]("stage"))
    assert(got4.length === 4 && got4.last.getAs[Long]("n_users") === 0L)
  }

  test("q51 funnel stages are monotonically non-increasing") {
    val rows = EventQueries.q51Funnel(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("stage")).map(_.getAs[Long]("n_users"))
    assert(rows.length === 3)
    assert(rows.zip(rows.tail).forall { case (a, b) => a >= b },
      s"later funnel stages cannot gain users: ${rows.toSeq}")
    assert(rows.head > 0, "fixture must have viewers")
  }

  test("q51 ordering matters: a purchase before any view never converts") {
    // independently recompute stage 3 with an explicit per-user check
    val ev = Tables.events(spark, sfDir).cache()
    val purchasers = EventQueries.q51Funnel(spark, sfDir)
      .filter(col("stage") === 3).collect()(0).getAs[Long]("n_users")
    val perUser = ev.groupBy(col("user_id")).agg(
      min(when(col("event_type") === "view", col("ts"))).as("v"),
      max(when(col("event_type") === "purchase", col("ts"))).as("lastP"))
    // upper bound: users whose LAST purchase is after their first view
    val upper = perUser
      .filter(col("v").isNotNull && col("lastP").isNotNull &&
        col("lastP") > col("v")).count()
    assert(purchasers <= upper)
    ev.unpersist()
  }

  test("q52 cohort week-0 counts every cohort member exactly once") {
    val out = EventQueries.q52CohortRetention(spark, sfDir).cache()
    // week 0 contains each user's first-seen day, so summing week-0 across
    // cohorts must equal the number of distinct users
    val week0 = out.filter(col("week_offset") === 0)
      .agg(sum(col("n_active"))).collect()(0).getLong(0)
    val users = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(week0 === users)
    // retention never exceeds the cohort's week-0 size
    val w0 = out.filter(col("week_offset") === 0)
      .select(col("cohort_day"), col("n_active").as("cohort_size"))
    assert(out.join(w0, "cohort_day")
      .filter(col("n_active") > col("cohort_size")).isEmpty)
    out.unpersist()
  }
}
