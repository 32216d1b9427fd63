package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.GraftEventSource
import graft.sources.Tables

/** The DSv2 source (r42): pushdown must reach the WIRE, not just the plan.
  * The FakePagedApi's page log records every (key, window, cursor) request,
  * so the assertions here are about what the server actually saw — narrowed
  * windows under a ts filter, absent keys under a user_id IN, pages spread
  * across task partitions — with row-level equality against the parquet
  * truth re-read directly. */
class Dsv2SourceSpec extends AnyFunSuite {
  import TestSpark._
  import TestSpark.spark.implicits._

  /** Synthetic corpus with INTRA-DAY timestamps (the parquet corpus is
    * dense enough, but the residual test needs rows on both sides of noon
    * on a known day): 6 keys × 10 days × 4 rows/day at 03:00/09:00/15:00/
    * 21:00. Day 0 = 2024-03-01. */
  private val day0 = java.time.LocalDate.parse("2024-03-01")
  private def us(day: Int, hour: Int): Long =
    (day0.toEpochDay + day) * 86400000000L + hour * 3600000000L
  private lazy val fakeData: Map[Long, Vector[graft.sources.ApiEventRow]] =
    (1L to 6L).map { uid =>
      uid -> (for (d <- 0 until 10; h <- Seq(3, 9, 15, 21)) yield
        graft.sources.ApiEventRow(uid * 1000 + d * 10 + h, us(d, h), uid,
          s"t${(d + h) % 3}", d + h / 10.0, s"p$uid")).toVector
    }.toMap

  private var n = 0
  /** Fresh registered api per test (page log starts clean). */
  private def freshApi(pageSize: Int = 7): (String, FakePagedApi.Stats) = {
    n += 1
    val id = s"dsv2-spec-$n"
    val stats = FakePagedApi.register(id, fakeData)
    GraftEventSource.registerApi(id, new FakePagedApi(id, pageSize))
    (id, stats)
  }

  private def read(id: String, partitions: Int = 4) = spark.read
    .format("graft-events")
    .option("api", id)
    .option("from", day0.toString)
    .option("to", day0.plusDays(9).toString)
    .option("partitions", partitions)
    .option("backoffMs", 1) // spec convention: no real sleeps
    .load()

  test("full read equals the fake server's corpus, distributed over partitions") {
    val (id, stats) = freshApi()
    val got = read(id).select($"event_id", unix_micros($"ts"), $"user_id",
      $"event_type", $"value", $"props").collect()
      .map(r => graft.sources.ApiEventRow(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getString(5))).sortBy(_.event_id)
    val want = fakeData.values.flatten.toArray.sortBy(_.event_id)
    assert(got.toSeq == want.toSeq)
    assert(stats.partitionsSeen.size() > 1, "pages all fetched by one task")
    assert(stats.driverPageCalls.get() == 0, "a page was fetched on the driver")
  }

  test("ts >= pushdown narrows every wire request's window — late days never asked for") {
    val (id, stats) = freshApi()
    val cut = day0.plusDays(7)
    val got = read(id).filter($"ts" >= to_timestamp(lit(s"$cut 00:00:00"))).count()
    assert(got == 6 * 3 * 4) // days 7,8,9
    // every page request the server saw started at the narrowed day
    val keys = stats.pageAttempts.keySet().iterator()
    var saw = 0
    while (keys.hasNext) {
      val k = keys.next() // "uid:from:to:start"
      assert(k.split(":")(1) == cut.toString, s"un-narrowed wire request $k")
      saw += 1
    }
    assert(saw > 0)
  }

  test("sub-day ts cut: window floors to the day, the residual restores exactness") {
    val (id, _) = freshApi()
    val cut = day0.plusDays(7)
    // noon cut: day 7's 03:00/09:00 rows are INSIDE the fetched window but
    // must be filtered back out by the residual Spark re-applies
    val got = read(id).filter($"ts" >= to_timestamp(lit(s"$cut 12:00:00")))
    assert(got.count() == 6 * (2 + 4 + 4))
    assert(got.filter(unix_micros($"ts") < lit(us(7, 12))).count() == 0)
  }

  test("user_id IN pushdown: pruned keys are never requested from the server") {
    val (id, stats) = freshApi()
    val got = read(id).filter($"user_id".isin(2L, 5L))
    assert(got.select($"user_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(2L, 5L))
    val it = stats.pageAttempts.keySet().iterator()
    var saw = 0
    while (it.hasNext) {
      val k = it.next()
      assert(Set("2", "5").contains(k.split(":")(0)), s"pruned key requested: $k")
      saw += 1
    }
    assert(saw > 0)
  }

  test("column pruning reaches the scan: the plan's ReadSchema drops unselected fields") {
    val (id, _) = freshApi()
    val df = read(id).select($"event_type", $"value")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("event_type") && scan.contains("value"))
    assert(!scan.contains("props"), scan.take(1500))
    val total = df.agg(sum($"value")).head().getDouble(0)
    val want = fakeData.values.flatten.map(_.value).sum
    assert(math.abs(total - want) < 1e-9)
  }

  test("a window closed by contradictory pushdown plans zero partitions and returns empty") {
    val (id, stats) = freshApi()
    val got = read(id)
      .filter($"ts" >= to_timestamp(lit(s"${day0.plusDays(20)} 00:00:00")))
    assert(got.count() == 0)
    assert(stats.pageCalls.get() == 0, "server was asked for an empty window")
  }

  test("transient page faults are absorbed by the per-partition retry session") {
    n += 1
    val id = s"dsv2-spec-$n"
    FakePagedApi.register(id, fakeData)
    GraftEventSource.registerApi(id,
      new FakePagedApi(id, pageSize = 7, failEveryNthPage = 3))
    val stats = FakePagedApi.stats(id)
    assert(read(id).count() == fakeData.values.map(_.size).sum)
    assert(stats.transientFailures.get() > 0, "fault injection never fired")
  }

  test("limit pushdown stops the paging — pages past the cut never requested") {
    val (id, stats) = freshApi() // 6 keys × 40 rows, pageSize 7 → 36 pages full
    val got = read(id).limit(3).collect()
    assert(got.length == 3)
    // each partition reader stops within its first page; even if Spark
    // runs every partition, that is ≤ #partitions pages, nowhere near 36
    assert(stats.pageCalls.get() <= 4,
      s"limit fetched ${stats.pageCalls.get()} pages")
  }

  test("runtime (join-driven) filtering prunes keys at the wire") {
    val (id, stats) = freshApi()
    // the pruning rule wants a SELECTIVE predicate surviving on the build
    // side (a bare in-memory dim constant-folds its filter away), so the
    // dim goes through parquet like a real dimension table would
    val dimPath = graft.operators.Extras.tempDir("dsv2-dpp-dim")
    (1L to 6L).map(u => (u, if (u == 3L || u == 6L) "keep" else "drop"))
      .toDF("user_id", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter($"tag" === "keep")
    val joined = read(id).join(broadcast(dim), Seq("user_id"))
    val n = joined.count()
    assert(n == 2 * 40) // 2 keys × 10 days × 4 rows
    val it = stats.pageAttempts.keySet().iterator()
    var requested = Set.empty[String]
    while (it.hasNext) requested += it.next().split(":")(0)
    assert(requested.nonEmpty)
    assert(requested.subsetOf(Set("3", "6")),
      s"runtime filter did not reach the wire: keys requested = $requested")
  }

  test("r42 gate face: DSv2 read digest equals the direct-parquet digest") {
    val viaSource = graft.sources.Dsv2Fetch.dsv2FetchQuery(spark, sf).collect().toSeq
    val cutTs = Tables.events(spark, sf)
      .agg(min(to_date($"ts"))).head().getDate(0).toLocalDate.plusDays(20)
    val direct = Tables.events(spark, sf)
      .filter($"ts" >= to_timestamp(lit(s"$cutTs 12:00:00")))
      .select($"event_type", $"user_id", to_date($"ts").as("d"), $"value")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), countDistinct($"user_id").as("n_users"),
        min($"d").as("first_d"), max($"d").as("last_d"),
        sum(floor($"value" * 100.0 + 0.5).cast("long")).as("value_cents"))
      .withColumn("value_sum", $"value_cents".cast("double") / 100.0)
      .drop("value_cents")
      .orderBy($"event_type").collect().toSeq
    assert(viaSource.nonEmpty && viaSource == direct)
  }

  test("Dsv2EventConnector.fetch: large key domain, zero driver-collected keys, " +
      "pruned keys never paged") {
    // 400-key domain — the regime where an `isin` literal would inline
    // every key into the plan; the connector must instead let the
    // broadcast join's runtime filter prune the page plan at the wire
    n += 1
    val id = s"dsv2-spec-$n"
    val bigData: Map[Long, Vector[graft.sources.ApiEventRow]] =
      (1L to 400L).map { uid =>
        uid -> (for (d <- 0 until 10) yield
          graft.sources.ApiEventRow(uid * 100 + d, us(d, 9), uid,
            s"t${d % 3}", d.toDouble, s"p$uid")).toVector
      }.toMap
    val stats = FakePagedApi.register(id, bigData)
    GraftEventSource.registerApi(id, new FakePagedApi(id, pageSize = 7))

    // request frame through parquet with a surviving selective predicate
    // (the runtime-pruning rule's benefit test), exactly how the daily
    // product's watermark frame arrives: keyed rows + fetch_needed filter
    val reqPath = graft.operators.Extras.tempDir("dsv2-conn-req")
    (1L to 400L).map { u =>
      val needed = u == 5L || u == 250L || u == 399L
      (u, java.sql.Date.valueOf(day0.plusDays(2)),
        java.sql.Date.valueOf(day0.plusDays(6)), needed)
    }.toDF("user_id", "fetch_start", "fetch_end", "fetch_needed")
      .write.mode("overwrite").parquet(reqPath)
    val requests = spark.read.parquet(reqPath).filter($"fetch_needed")

    val got = new graft.sources.Dsv2EventConnector(id).fetch(spark, requests)
      .select($"user_id", $"d", $"value").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2))).sorted.toSeq
    val want = (for (u <- Seq(5L, 250L, 399L); d <- 2 to 6) yield
      (u, day0.plusDays(d).toString, d.toDouble)).sorted
    assert(got == want)
    assert(stats.driverPageCalls.get() == 0, "a page was fetched on the driver")
    val it = stats.pageAttempts.keySet().iterator()
    var requested = Set.empty[String]
    while (it.hasNext) requested += it.next().split(":")(0)
    assert(requested.nonEmpty)
    assert(requested.subsetOf(Set("5", "250", "399")),
      s"runtime filter did not prune the page plan: keys requested = $requested")
    // the window option derived from the request frame also reached the
    // wire: no page asked for days outside [day0+2, day0+6]
    val it2 = stats.pageAttempts.keySet().iterator()
    while (it2.hasNext) {
      val parts = it2.next().split(":")
      assert(parts(1) == day0.plusDays(2).toString &&
        parts(2) == day0.plusDays(6).toString,
        s"page window not narrowed: ${parts.mkString(":")}")
    }
  }
}
