package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-analytics catalog over the `events` stream table: ordered
  * funnel conversion and cohort retention — the two aggregate shapes
  * product analytics runs at scale.
  *
  * Both are expressed as conditional aggregations and user-keyed joins
  * (map-side partial aggregation everywhere, shuffles only on user_id /
  * cohort keys); no windows over the full event stream and no
  * per-event state. Counts-only outputs keep the oracles free of
  * timestamp-precision concerns (events.parquet is TIMESTAMP(NANOS),
  * Spark reads microseconds).
  */
object EventQueries {

  /** q51 — strictly-ordered funnel view → click → purchase: a user
    * converts at stage n when the stage event happens AFTER their
    * stage-(n-1) conversion time. Each stage is a filtered aggregate
    * joined on user_id — no event self-join on time ranges, no window
    * over the stream. */
  def q51Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val viewed = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val clicked = ev.filter(col("event_type") === "click")
      .join(viewed, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val purchased = ev.filter(col("event_type") === "purchase")
      .join(clicked, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    def stage(name: String, order: Long, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(order).as("stage"), lit(name).as("stage_name"),
          col("n_users"))
    stage("view", 1, viewed)
      .unionByName(stage("click_after_view", 2, clicked))
      .unionByName(stage("purchase_after_click", 3, purchased))
  }

  val q51Sql: String =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS t_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t_view
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS t_purchase
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |  GROUP BY e.user_id)
      |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
      |  CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'click_after_view',
      |  CAST((SELECT COUNT(*) FROM c) AS BIGINT)
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), 'purchase_after_click',
      |  CAST((SELECT COUNT(*) FROM p) AS BIGINT)""".stripMargin

  /** q52 — weekly cohort retention: users grouped by first-seen day,
    * counted as retained in each later week they produce any event.
    * Distinct (user, active-day) first so the retention join moves one
    * row per user-day, not one per event. */
  def q52CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val firstSeen = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    val activeDays = ev.distinct()
    activeDays.join(firstSeen, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"),
        floor(datediff(col("day"), col("cohort_day")) / 7).cast("long")
          .as("week_offset"))
      .distinct()
      .groupBy(col("cohort_day"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .select(col("cohort_day").cast("string").as("cohort_day"),
        col("week_offset"), col("n_active"))
  }

  val q52Sql: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |f AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id),
      |w AS (
      |  SELECT DISTINCT d.user_id, f.cohort_day,
      |    CAST((d.day - f.cohort_day) // 7 AS BIGINT) AS week_offset
      |  FROM d JOIN f ON d.user_id = f.user_id)
      |SELECT CAST(cohort_day AS VARCHAR) AS cohort_day, week_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_active
      |FROM w GROUP BY cohort_day, week_offset""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_funnel" -> (q51Funnel _),
    "q52_cohort_retention" -> (q52CohortRetention _))

  val oracles: Map[String, String] = Map(
    "q51_funnel" -> q51Sql,
    "q52_cohort_retention" -> q52Sql)
}
