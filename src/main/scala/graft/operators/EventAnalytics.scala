package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product-analytics staples over the events stream (SURVEY.md §2 A-rows
  * q41/q42): ordered funnel conversion and cohort retention. Both are
  * integer-only (epoch-micro comparisons, integer week indices) so the
  * DuckDB oracle compares exactly, and both key every shuffle on user_id
  * so the per-user stages share one partitioning. */
object EventAnalytics {

  // ---------------------------------------------------------------- q41
  /** q41: ordered funnel view → click → purchase. A user converts a stage
    * only with a STRICTLY LATER event than their previous stage's first
    * time (first view, first click after that, first purchase after that)
    * — the order-sensitive formulation, not three independent counts.
    * Scale shape: three min-aggregations all keyed on user_id (one shuffle
    * key end to end); each stage's join input shrinks to the previous
    * stage's survivors; the final stack is 1 row × 3 stages. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    // each stage feeds BOTH the next stage's join and its own count —
    // persist (caller-config) or the events scan re-runs per sink
    val v = graft.GraftSession.maybeCache(ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t1")))
    val c = graft.GraftSession.maybeCache(ev.filter($"event_type" === "click")
      .join(v, Seq("user_id")).filter($"us" > $"t1")
      .groupBy($"user_id").agg(min($"us").as("t2")))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, Seq("user_id")).filter($"us" > $"t2")
      .groupBy($"user_id").agg(min($"us").as("t3"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
      .selectExpr("stack(3, 'view', n_view, 'click', n_click, 'purchase', n_purchase) AS (stage, n_users)")
      .orderBy($"stage")
  }

  val funnelSql: String =
    Tables.eventsOracleCte + """,
      |fv AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events_us
      |       WHERE event_type = 'view' GROUP BY 1),
      |fc AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      |       FROM events_us e JOIN fv USING (user_id)
      |       WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1 GROUP BY 1),
      |fp AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      |       FROM events_us e JOIN fc USING (user_id)
      |       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2 GROUP BY 1)
      |SELECT stage, n_users FROM (
      |  SELECT 'view' AS stage, CAST((SELECT count(*) FROM fv) AS BIGINT) AS n_users
      |  UNION ALL
      |  SELECT 'click', CAST((SELECT count(*) FROM fc) AS BIGINT)
      |  UNION ALL
      |  SELECT 'purchase', CAST((SELECT count(*) FROM fp) AS BIGINT))
      |ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------- q42
  /** q42: weekly cohort retention. Weeks are INTEGER indices
    * (floor((epoch_day + 3) / 7): Monday-aligned weeks since epoch) — no
    * date-truncation formatting to diverge between engines. cohort = a
    * user's first active week; one (cohort_week, week_offset) cell counts
    * the users from that cohort active in that week. Scale shape:
    * user-distinct weeks and the first-week aggregate share the user_id
    * shuffle; the cell rollup is cohorts × offsets (tiny), fully
    * partial-aggregable — the classic triangle matrix at any scale. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wk = floor((floor(unix_micros($"ts") / lit(86400000000L)) + 3) / 7).cast("long")
    // feeds both the cohort aggregate and the cell join — persist once
    val userWeeks = graft.GraftSession.maybeCache(Tables.events(spark, dir)
      .select($"user_id", wk.as("wk")).distinct())
    val cohorts = userWeeks.groupBy($"user_id").agg(min($"wk").as("cohort_week"))
    userWeeks.join(cohorts, Seq("user_id"))
      .groupBy($"cohort_week", ($"wk" - $"cohort_week").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_week", $"week_offset")
  }

  val retentionSql: String =
    Tables.eventsOracleCte + """,
      |uw AS (SELECT DISTINCT user_id,
      |         CAST(floor((floor(epoch_us(ts) / 86400000000) + 3) / 7) AS BIGINT) AS wk
      |       FROM events_us),
      |ch AS (SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY 1)
      |SELECT cohort_week, wk - cohort_week AS week_offset,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM uw JOIN ch USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
