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
