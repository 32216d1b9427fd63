package graft

import java.time.{LocalDate, LocalDateTime}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CciPipeline, Scheduler}

/** r35: the declarative schedule plan and its driver-side scalar twin.
  * The column form is oracle-gated (driver DuckDB compare); this spec
  * pins the parts the oracle can't see — the literal cron table against
  * app.py:93-110, the fire-time gate against the r22 calendar rule, and
  * the scalar [[Scheduler.nextFires]] agreeing with the column form at
  * every probe instant (the isTradingDay/isTradingDayLocal pattern). */
class SchedulerSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val plan = Scheduler.schedulePlan(spark, sf).collect()

  test("r35: five jobs fire every calendar day of the feed span") {
    val days = plan.map(_.getDate(0)).distinct.sorted
    assert(plan.length == days.length * Scheduler.Jobs.length)
    // span is contiguous: one row block per calendar day, holidays included
    val span = days.last.toLocalDate.toEpochDay - days.head.toLocalDate.toEpochDay + 1
    assert(days.length == span.toInt)
  }

  test("r35: firing instants and gate match app.py's cron table and the calendar rule") {
    val byDay = plan.groupBy(_.getDate(0).toLocalDate)
    byDay.foreach { case (d, rows) =>
      val want = Scheduler.Jobs.map { case (j, h, m) =>
        (j, d.toEpochDay * 86400000000L + (h * 60L + m) * 60000000L)
      }.sortBy(r => (r._2, r._1))
      val got = rows.sortBy(r => (r.getLong(2), r.getString(1)))
        .map(r => (r.getString(1), r.getLong(2))).toSeq
      assert(got == want, s"cron rows for $d")
      // every job row of a day carries the SAME fire-time gate, and it is
      // exactly the r22 trading-day rule
      val gates = rows.map(_.getBoolean(3)).distinct
      assert(gates.toSeq == Seq(CciPipeline.isTradingDayLocal(d)), s"gate for $d")
    }
  }

  test("r35: nextFires agrees with the column form at every probe instant") {
    val instants = plan.map(_.getLong(2))
    val minUs = instants.min
    val maxUs = instants.max
    // probe just before/after each distinct fire time of one day, plus
    // mid-gaps — every branch of the scalar (before first, between jobs,
    // after last -> next day) gets hit inside the span
    val probes = Seq(0L, 7L * 3600, 9L * 3600, 9L * 3600 + 1, 12L * 3600,
      15L * 3600 + 22 * 60, 15L * 3600 + 34 * 60 + 59, 15L * 3600 + 35 * 60,
      23L * 3600)
    for (dayUs <- Seq(minUs - minUs % 86400000000L,
           maxUs - maxUs % 86400000000L - 86400000000L);
         sec <- probes) {
      val nowUs = dayUs + sec * 1000000L
      val now = LocalDateTime.ofEpochSecond(nowUs / 1000000L, 0,
        java.time.ZoneOffset.UTC)
      val (at, jobs) = Scheduler.nextFires(now)
      val atUs = at.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
      val colNext = instants.filter(_ > nowUs)
      if (colNext.nonEmpty) {
        assert(atUs == colNext.min, s"next instant after $now")
        val colJobs = plan.filter(_.getLong(2) == colNext.min)
          .map(_.getString(1)).sorted.toSeq
        assert(jobs == colJobs, s"jobs firing at $at")
      }
    }
  }

  test("r35: after the last job of a day the scalar rolls to 09:00 next day") {
    val now = LocalDate.of(2026, 3, 6).atTime(20, 0)
    val (at, jobs) = Scheduler.nextFires(now)
    assert(at == LocalDate.of(2026, 3, 7).atTime(9, 0))
    assert(jobs == Seq("kr_buy_order", "kr_reco_data"))
  }
}
