package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.GraftEventSource

/** v15: the DSv2 feed's streaming face. Offsets are days; availability is
  * the clock the harness advances (the reference's cron-driven "today").
  * The assertions that matter: each advance ingests exactly the newly
  * available days (no dupes, no gaps), a restart resumes from the
  * CHECKPOINTED day (committed days are never re-fetched from the server
  * — pinned on the page log), and the quiet-clock case plans no batch. */
class Dsv2StreamSpec extends AnyFunSuite {
  import TestSpark._
  import TestSpark.spark.implicits._

  private val day0 = java.time.LocalDate.parse("2024-03-01")
  private def us(day: Int, hour: Int): Long =
    (day0.toEpochDay + day) * 86400000000L + hour * 3600000000L
  private def mkData(nDays: Int): Map[Long, Vector[graft.sources.ApiEventRow]] =
    (1L to 4L).map { uid =>
      uid -> (for (d <- 0 until nDays; h <- Seq(6, 18)) yield
        graft.sources.ApiEventRow(uid * 1000 + d * 10 + h, us(d, h), uid,
          s"t${(d + h) % 3}", d + h / 10.0, s"p$uid")).toVector
    }.toMap

  private var n = 0
  private def freshApi(): (String, FakePagedApi.Stats) = {
    n += 1
    val id = s"dsv2-stream-$n"
    val stats = FakePagedApi.register(id, mkData(10))
    GraftEventSource.registerApi(id, new FakePagedApi(id, pageSize = 5))
    (id, stats)
  }

  private def readStream(id: String) = spark.readStream
    .format("graft-events")
    .option("api", id)
    .option("from", day0.toString)
    .option("to", day0.plusDays(9).toString)
    .option("partitions", 2)
    .option("backoffMs", 1)
    .load()

  test("v15: clock advances ingest exactly the newly available days") {
    val (id, _) = freshApi()
    GraftEventSource.advanceClock(id, day0.toEpochDay + 2)
    val q = readStream(id)
      .select($"event_id", to_date($"ts").as("d"), $"user_id")
      .writeStream.outputMode("append").format("memory").queryName("v15_out").start()
    try {
      q.processAllAvailable()
      val afterC2 = spark.table("v15_out").collect()
      assert(afterC2.length == 4 * 2 * 3) // days 0,1,2
      assert(afterC2.map(_.getDate(1).toLocalDate.toEpochDay).max == day0.toEpochDay + 2)

      GraftEventSource.advanceClock(id, day0.toEpochDay + 6)
      q.processAllAvailable()
      val afterC6 = spark.table("v15_out").collect()
      assert(afterC6.length == 4 * 2 * 7) // days 0..6
      assert(afterC6.map(_.getLong(0)).distinct.length == afterC6.length, "duplicate rows")

      // clock past the option window: capped at `to`
      GraftEventSource.advanceClock(id, day0.toEpochDay + 50)
      q.processAllAvailable()
      assert(spark.table("v15_out").count() == 4 * 2 * 10)
    } finally q.stop()
  }

  test("v15: restart resumes from the checkpoint — committed days never re-fetched") {
    val (id, stats) = freshApi()
    val ckpt = graft.operators.Extras.tempDir("v15-ckpt")
    val out = graft.operators.Extras.tempDir("v15-out")
    def run(): Unit = {
      val q = readStream(id)
        .select($"event_id", $"ts", $"user_id", $"value")
        .writeStream.outputMode("append").format("parquet")
        .option("checkpointLocation", ckpt).option("path", out).start()
      try q.processAllAvailable() finally q.stop()
    }
    GraftEventSource.advanceClock(id, day0.toEpochDay + 4)
    run()
    assert(spark.read.parquet(out).count() == 4 * 2 * 5)

    GraftEventSource.advanceClock(id, day0.toEpochDay + 9)
    run() // NEW query, same checkpoint: resumes after day 4
    val rows = spark.read.parquet(out)
    assert(rows.count() == 4 * 2 * 10)
    assert(rows.select($"event_id").distinct().count() == 4 * 2 * 10, "restart duplicated rows")

    // the server-side page log: the day windows requested never overlap —
    // each day was fetched under exactly one batch window
    val windows = {
      val it = stats.pageAttempts.keySet().iterator()
      var w = Set.empty[(Long, Long)]
      while (it.hasNext) {
        val parts = it.next().split(":") // uid:from:to:start
        w += ((java.sql.Date.valueOf(parts(1)).toLocalDate.toEpochDay,
          java.sql.Date.valueOf(parts(2)).toLocalDate.toEpochDay))
      }
      w.toSeq.sortBy(_._1)
    }
    assert(windows.nonEmpty)
    windows.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(lo2 > hi1,
        s"batch windows overlap: $windows — a committed day was re-fetched")
      case _ =>
    }
  }

  test("v16: feed in, orders out — streamed placement is content-exact across a restart") {
    val (feedId, _) = freshApi()
    val brokerId = s"$feedId-broker"
    val st = graft.sources.v2.InMemoryOrderBroker.ensure(brokerId)
    val api = new graft.sources.v2.InMemoryOrderBroker(brokerId)
    graft.sources.v2.GraftOrderSink.registerApi(brokerId, api)
    val ckpt = graft.operators.Extras.tempDir("v16-ckpt")
    def run(): Unit = {
      val q = readStream(feedId)
        .select(concat(lit("ORD-"), $"event_id").as("order_no"), $"user_id",
          lit("buy").as("side"), lit(1L).as("qty"), $"value".as("price"),
          to_date($"ts").as("d"))
        .writeStream.format("graft-orders")
        .option("api", brokerId).option("backoffMs", 1)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    GraftEventSource.advanceClock(feedId, day0.toEpochDay + 4)
    run()
    def book = api.ledger(api.issueToken())
    assert(book.size == 4 * 2 * 5) // every event of days 0..4 placed once
    GraftEventSource.advanceClock(feedId, day0.toEpochDay + 9)
    run() // restart from the checkpoint: only days 5..9 replayed
    assert(book.size == 4 * 2 * 10)
    assert(book.map(_.order_no).distinct.size == book.size)
    assert(st.staged.isEmpty, "committed epochs left staged pages behind")
  }

  test("v15: a quiet clock plans no batch and a fresh advance wakes the stream") {
    val (id, stats) = freshApi()
    GraftEventSource.advanceClock(id, day0.toEpochDay - 1) // nothing available
    val q = readStream(id)
      .select($"event_id")
      .writeStream.outputMode("append").format("memory").queryName("v15_quiet").start()
    try {
      q.processAllAvailable()
      assert(spark.table("v15_quiet").count() == 0)
      assert(stats.pageCalls.get() == 0, "server paged despite an empty window")
      GraftEventSource.advanceClock(id, day0.toEpochDay)
      q.processAllAvailable()
      assert(spark.table("v15_quiet").count() == 4 * 2) // day 0 only
    } finally q.stop()
  }
}
