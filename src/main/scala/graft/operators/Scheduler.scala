package graft.operators

import java.time.{LocalDateTime, LocalTime}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The reference's clock-driven scheduler (app.py:93-110
  * `setup_scheduler`) re-expressed declaratively: instead of a daemon
  * blocking on APScheduler cron triggers, the schedule is a DIMENSION —
  * one row per (calendar day, job) with its firing instant and the
  * trading-day gate the job applies when it fires. A driver that wants
  * the daemon behavior sleeps until [[nextFires]] and runs the listed
  * jobs ([[graft.Daily.run]] consumes the same gate per day); everything
  * else — audit ("what ran / should have run when"), backfill planning,
  * catch-up after an outage — is a plain query over this table, which a
  * side-effecting cron loop cannot answer.
  *
  * Scale shape: days-dimension frame (one row per day per job) built
  * from one min/max aggregate over the events corpus; the five-row job
  * table is a broadcast literal cross join. No corpus-scale shuffle.
  */
object Scheduler {

  /** (job_id, hour, minute): app.py's five daily cron triggers — buy
    * order + signal recommendations at 09:00 (app.py:100-103), sell
    * order at 15:22 (:105), order-execution update at 15:31 (:108), the
    * composed best-data pipeline at 15:35 (:97-98). The cron fires every
    * calendar day; the holiday/weekend skip is the JOB's own check at
    * fire time (execute_pipeline's is_holiday, app.py:54; the order
    * jobs' gates, daily_function.py:1589,1937,1949) — mirrored here by
    * the `runs` column, not by dropping rows. */
  val Jobs: Seq[(String, Int, Int)] = Seq(
    ("kr_buy_order", 9, 0),
    ("kr_reco_data", 9, 0),
    ("kr_sell_order", 15, 22),
    ("kr_execution_update", 15, 31),
    ("kr_best_data", 15, 35))

  private val MicrosPerDay = 86400000000L
  private val MicrosPerMinute = 60000000L

  /** r35: the schedule plan over the feed's calendar span. `scheduled_at_us`
    * is integer epoch micros (tz-free engine parity, the v08b precedent);
    * `runs` is [[CciPipeline.isTradingDay]] — r22's calendar gate. */
  def schedulePlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val span = Tables.events(spark, dir)
      .agg(min(to_date($"ts")).as("mn"), max(to_date($"ts")).as("mx"))
    val jobs = Jobs.toDF("job_id", "hh", "mm")
    span.select(explode(sequence($"mn", $"mx")).as("d"))
      .crossJoin(broadcast(jobs))
      .select($"d", $"job_id",
        (unix_date($"d").cast("long") * MicrosPerDay +
          ($"hh" * 60 + $"mm").cast("long") * MicrosPerMinute)
          .as("scheduled_at_us"),
        CciPipeline.isTradingDay($"d").as("runs"))
      .orderBy($"d", $"scheduled_at_us", $"job_id")
  }

  val schedulePlanSql: String = {
    val jobRows = Jobs.map { case (j, h, m) => s"('$j', $h, $m)" }.mkString(", ")
    Tables.eventsOracleCte + ",\n" +
      s"""span AS (SELECT min(CAST(ts AS DATE)) AS mn, max(CAST(ts AS DATE)) AS mx
         |          FROM events_us),
         |days AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS d FROM span),
         |jobs(job_id, hh, mm) AS (VALUES $jobRows)
         |SELECT d, job_id,
         |  date_diff('day', DATE '1970-01-01', d) * $MicrosPerDay
         |    + CAST(hh * 60 + mm AS BIGINT) * $MicrosPerMinute AS scheduled_at_us,
         |  ((date_diff('day', DATE '1970-01-01', d) + 3) % 7 < 5
         |    AND day(d) % 7 <> 3) AS runs
         |FROM days CROSS JOIN jobs
         |ORDER BY d, scheduled_at_us, job_id""".stripMargin
  }

  /** Driver-side scalar twin of [[schedulePlan]]'s clock arithmetic (the
    * isTradingDay/isTradingDayLocal pattern, spec-pinned to agree with
    * the column form): the next firing instant strictly after `now` and
    * the job ids that fire then (09:00 fires two). A daemon replacement
    * for app.py's scheduler is `while (true) { sleep until
    * nextFires(clock)._1; run the listed jobs }`. */
  def nextFires(now: LocalDateTime): (LocalDateTime, Seq[String]) = {
    val byTime = Jobs.groupBy { case (_, h, m) => (h, m) }.toSeq.sortBy(_._1)
    byTime.collectFirst {
      case ((h, m), js) if now.toLocalTime.isBefore(LocalTime.of(h, m)) =>
        (now.toLocalDate.atTime(h, m), js.map(_._1).sorted)
    }.getOrElse {
      val ((h, m), js) = byTime.head
      (now.toLocalDate.plusDays(1).atTime(h, m), js.map(_._1).sorted)
    }
  }
}
