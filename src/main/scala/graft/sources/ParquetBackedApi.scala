package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.v2.GraftEventSource

/** Local stand-in for the remote paged feed behind the DSv2 source: "the
  * API's database" is the events table, collected ONCE driver-side into a
  * JVM-static registry and served back page by page ([[FakePagedApi]]'s
  * registry pattern promoted to the gate). Bounded by construction: the
  * gate runs at sf ≤ 0.01 (10k rows); a production [[PagedEventApi]]
  * holds an HTTP client here instead — the registry exists because a live
  * connection can't ride a string option map, and local-mode executors
  * share the JVM. This class models the API CONTRACT (day-window requests,
  * cursor paging, dimension-scale listKeys); the oracle-checkable data it
  * serves is what makes the DSv2 machinery's gate a real equality proof. */
final class ParquetBackedPagedApi(id: String, pageSize: Int) extends PagedEventApi {
  private def data = ParquetBackedPagedApi.registry.get(id)
  private def epochDay(us: Long): Long = Math.floorDiv(us, 86400000000L)

  override def issueToken(): String = s"$id-token"

  override def listKeys(token: String, asOf: java.sql.Date): Seq[Long] = {
    val cut = asOf.toLocalDate.toEpochDay
    data.collect {
      case (uid, rows) if rows.exists(r => epochDay(r.ts_micros) <= cut) => uid
    }.toSeq.sorted
  }

  override def fetchPage(token: String, userId: Long, from: java.sql.Date,
      to: java.sql.Date, cursor: Option[String]): ApiPage = {
    val lo = from.toLocalDate.toEpochDay
    val hi = to.toLocalDate.toEpochDay
    val rows = data.getOrElse(userId, Vector.empty)
      .filter(r => { val d = epochDay(r.ts_micros); d >= lo && d <= hi })
    val start = cursor.map(_.toInt).getOrElse(0)
    val page = rows.slice(start, start + pageSize)
    val next = if (start + pageSize < rows.size) Some((start + pageSize).toString) else None
    ApiPage(page, next)
  }
}

object ParquetBackedPagedApi {
  private[sources] val registry
      : ConcurrentHashMap[String, Map[Long, Vector[ApiEventRow]]] =
    new ConcurrentHashMap

  /** Load `dir`'s events behind a registered api id (idempotent) and
    * return (id, min epoch day, max epoch day) of the served corpus. */
  def ensure(spark: SparkSession, dir: String, pageSize: Int = 256): (String, Long, Long) = {
    val id = s"parquet:$dir"
    registry.computeIfAbsent(id, _ => {
      import spark.implicits._
      Tables.events(spark, dir)
        .select($"event_id", unix_micros($"ts").as("ts_micros"), $"user_id",
          $"event_type", $"value", $"props")
        .as[(Long, Long, Long, String, Double, String)]
        .collect()
        .map(t => ApiEventRow(t._1, t._2, t._3, t._4, t._5, t._6))
        .groupBy(_.user_id)
        .view.mapValues(_.sortBy(r => (r.ts_micros, r.event_id)).toVector)
        .toMap
    })
    GraftEventSource.apis.computeIfAbsent(id,
      _ => new ParquetBackedPagedApi(id, pageSize)): Unit
    val days = registry.get(id).valuesIterator.flatten
      .map(r => Math.floorDiv(r.ts_micros, 86400000000L)).toSeq
    (id, days.min, days.max)
  }
}

/** r43: order placement THROUGH the DSv2 sink and back. A deterministic
  * order book derives from the purchase events (order per event, engine's
  * cents-grid price), is PLACED via `df.write.format("graft-orders")` —
  * executor-side staged pages, driver publish — then AMENDED with a
  * second batch (every 7th order's qty bumped) that exercises the
  * broker's keep-last `order_no` upsert (the reference's order-history
  * discipline, daily_function.py:1828 + drop_duplicates keep='last').
  * The query returns the broker's ledger (the order-history endpoint, a
  * dimension-scale driver read); the DuckDB oracle computes the same
  * amended book straight from events, so the gate proves the sink's
  * two-phase placement + upsert preserve content exactly. */
object OrderSinkRoundtrip {
  import graft.sources.v2.{GraftOrderSink, InMemoryOrderBroker}

  def orderSinkQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val brokerId = s"broker:$dir"
    InMemoryOrderBroker.ensure(brokerId): Unit
    GraftOrderSink.apis.computeIfAbsent(brokerId,
      _ => new InMemoryOrderBroker(brokerId)): Unit

    def orders(onlyAmended: Boolean): DataFrame = {
      val ev = Tables.events(spark, dir).filter($"event_type" === "purchase")
      val picked = if (onlyAmended) ev.filter(pmod($"event_id", lit(7L)) === 0) else ev
      val bump = if (onlyAmended) 11L else 1L
      picked.select(
        concat(lit("ORD-"), $"event_id").as("order_no"),
        $"user_id", lit("buy").as("side"),
        (pmod($"event_id", lit(5L)) + bump).as("qty"),
        (floor($"value" * 100.0 + 0.5).cast("long").cast("double") / 100.0).as("price"),
        to_date($"ts").as("d"))
    }
    orders(onlyAmended = false).write.format("graft-orders")
      .option("api", brokerId).option("backoffMs", 1).mode("append").save()
    orders(onlyAmended = true).write.format("graft-orders")
      .option("api", brokerId).option("backoffMs", 1).mode("append").save()

    val api = GraftOrderSink.apis.get(brokerId)
    val book = api.ledger(api.issueToken()).map { o =>
      (o.order_no, o.user_id, o.side, o.qty, o.price,
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(o.d_days.toLong)))
    }
    book.toDF("order_no", "user_id", "side", "qty", "price", "d")
      .orderBy($"order_no")
  }

  val orderSinkSql: String =
    Tables.eventsOracleCte + "\n" +
      """SELECT concat('ORD-', event_id) AS order_no, user_id,
        |  'buy' AS side,
        |  CASE WHEN event_id % 7 = 0 THEN event_id % 5 + 11
        |       ELSE event_id % 5 + 1 END AS qty,
        |  CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS DOUBLE) / 100.0
        |    AS price,
        |  CAST(ts AS DATE) AS d
        |FROM events_us
        |WHERE event_type = 'purchase'
        |ORDER BY order_no""".stripMargin
}

/** r42: the paged feed read THROUGH the DataSourceV2 table
  * ([[graft.sources.v2.GraftEventSource]]) with live pushdown — the
  * `ts >= (first day + 20)T12:00` cut narrows every key's fetch window at
  * the WIRE (20 of 30 days never requested; Dsv2SourceSpec pins the page
  * log) while its sub-day half stays a residual Spark re-applies, and
  * column pruning drops `props` from the readers. The digest aggregates
  * what arrived; the DuckDB oracle computes the same cut over the raw
  * events table, so the gate proves the source + pushdown window
  * arithmetic end to end (day-floor + residual ≡ exact timestamp cut). */
object Dsv2Fetch {
  def dsv2FetchQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (apiId, minDay, maxDay) = ParquetBackedPagedApi.ensure(spark, dir)
    val cutoff = java.time.LocalDate.ofEpochDay(minDay + 20)
    spark.read.format("graft-events")
      .option("api", apiId)
      .option("from", java.time.LocalDate.ofEpochDay(minDay).toString)
      .option("to", java.time.LocalDate.ofEpochDay(maxDay).toString)
      .load()
      .filter($"ts" >= to_timestamp(lit(s"$cutoff 12:00:00")))
      .select($"event_type", $"user_id", to_date($"ts").as("d"), $"value")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        min($"d").as("first_d"), max($"d").as("last_d"),
        sum(floor($"value" * 100.0 + 0.5).cast("long")).as("value_cents"))
      .withColumn("value_sum", $"value_cents".cast("double") / 100.0)
      .drop("value_cents")
      .orderBy($"event_type")
  }

  val dsv2FetchSql: String =
    Tables.eventsOracleCte + ",\n" +
      """ev AS (SELECT event_id, ts, user_id, event_type, value,
        |  CAST(ts AS DATE) AS d FROM events_us),
        |b AS (SELECT CAST(min(d) AS TIMESTAMP) + INTERVAL 20 DAY
        |  + INTERVAL 12 HOUR AS cutoff FROM ev)
        |SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  min(d) AS first_d, max(d) AS last_d,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
        |    AS value_sum
        |FROM ev CROSS JOIN b
        |WHERE ts >= cutoff
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
}
