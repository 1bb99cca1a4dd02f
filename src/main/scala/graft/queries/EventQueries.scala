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
  * timestamp-precision concerns (events.ts has shipped as both
  * TIMESTAMP(NANOS) and naive TIMESTAMP(MICROS) across testdata
  * generations; Tables.normalizeTs reads either as microseconds).
  */
object EventQueries {

  /** Strictly-ordered funnel over an arbitrary ordered stage list: a
    * user converts at stage n when a stage-n event happens AFTER their
    * stage-(n-1) conversion time (conversion time = earliest qualifying
    * event). Each stage is a filtered aggregate joined on user_id — no
    * event self-join on time ranges, no window over the stream, and the
    * per-stage state is one row per converted user.
    *
    * The events scan is paid ONCE: the projection is filtered to the
    * funnel's event types and localCheckpoint'd, so the k stage
    * aggregates read the materialized narrow subset instead of
    * rescanning the fact table k times. (For small k over a table with
    * cheap pushed-down type filters, rescanning can win — the
    * checkpoint trades executor storage for scan amortization, the
    * right default once k grows.) */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "a funnel needs at least one stage")
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
      .filter(col("event_type").isin(stages: _*))
      .localCheckpoint()
    var converted = ev.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_conv"))
    val perStage = Seq.newBuilder[(String, DataFrame)]
    perStage += ((stages.head, converted))
    stages.sliding(2).foreach {
      case Seq(prev, s) =>
        converted = ev.filter(col("event_type") === s)
          .join(converted, Seq("user_id"))
          .filter(col("ts") > col("t_conv"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_conv"))
        perStage += ((s"${s}_after_$prev", converted))
      case _ =>
    }
    perStage.result().zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("stage"), lit(name).as("stage_name"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** q51 — the view -> click -> purchase funnel, expressed through the
    * parameterized engine above. */
  def q51Funnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(spark, dir), Seq("view", "click", "purchase"))

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
