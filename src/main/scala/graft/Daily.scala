package graft

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CciPipeline
import graft.operators.CciPipeline.{Budget, BudgetFraction, BuyThresholds, FeeRate, GridConfig, TaxRate}
import graft.sources.{EventConnector, LocalFileEventConnector, Tables}

/** The daily orchestrated run — the reference's actual *product*
  * (app.py:49 `execute_pipeline` + :93 `setup_scheduler`): a scheduled job
  * that, once per trading day, resumes from saved state, fetches the delta
  * from the broker API, upserts the price series, recomputes indicators
  * incrementally, detects signals, places orders, and records a run digest.
  * Every stage exists as an oracle-gated operator (r21 watermark, r31
  * connector fetch, r02/r03 bars upsert, r30 incremental CCI, r05/r09
  * signals/recommendations, r13 orders, r22 holiday gate, r23 digest); this
  * object composes them over a persisted workspace, day after day.
  *
  * == Workspace layout (append-only, partitioned by run day) ==
  * {{{
  *   <root>/bars/run_d=<day>/    one partition per run: that day's new bars
  *   <root>/cci/run_d=<day>/     that day's recomputed CCI rows (delta only)
  *   <root>/orders/run_d=<day>/  that day's sized buy orders
  *   <root>/digest/run_d=<day>/  one-row run digest — written LAST, so its
  *                               _SUCCESS marker is the day's commit record
  *   <root>/conditions/          best-strategy dim consumed by the order step
  * }}}
  *
  * == Why this shape scales ==
  *  - **Writes ∝ delta.** CCI base rows never change when bars are appended
  *    after them (trailing windows), so the state tables are APPEND-ONLY:
  *    a day writes only its delta partition, never rewrites the corpus —
  *    at 100 TB the daily job's I/O tracks the day's arrivals.
  *  - **Reads prune.** State reads filter on the `run_d` partition column,
  *    so a rerun of day N never scans a crashed day-N partial partition.
  *  - **Idempotent reruns.** Each day overwrites exactly its own `run_d=`
  *    partitions; the watermark (recomputed from the durable bars state)
  *    makes a rerun of an already-committed day fetch an empty window and
  *    write empty deltas — a no-op. The digest partition doubles as the
  *    commit marker: [[run]] skips days whose digest committed, so a
  *    restarted schedule resumes where it crashed. (A transactional table
  *    format would make the multi-table day commit atomic; the ordering —
  *    bars, cci, orders, digest last — bounds the damage to "rerun the day".)
  *  - **No driver data.** The loop is driver-side *control* flow only (one
  *    iteration per day, like the reference's scheduler); every data step is
  *    a distributed plan. Per-series resume state (watermark, window
  *    context, `idx` position) is recovered from the state tables
  *    themselves, broadcast as dimension-scale frames.
  *
  * The whole-chain equality gate: after running N days incrementally, the
  * CCI state must equal the one-shot full recompute over the same events —
  * spec-asserted in DailyRunSpec, and driver-gated through [[dailyRunQuery]]
  * (r32), whose DuckDB oracle recomputes every day's digest from scratch.
  */
object Daily {

  /** Paths of one persisted daily-run workspace. */
  final case class Workspace(root: String) {
    def barsDir: String = s"$root/bars"
    def cciDir: String = s"$root/cci"
    def ordersDir: String = s"$root/orders"
    def digestDir: String = s"$root/digest"
    def conditionsDir: String = s"$root/conditions"
  }

  /** One row per executed run day — the r23 digest, per day. */
  final case class DayDigest(
      d: java.sql.Date,
      n_fetched: Long,
      n_bars_new: Long,
      n_cci_new: Long,
      n_cci_total: Long,
      n_series: Long,
      n_buy_signals: Long,
      n_orders: Long)

  private def overwrite(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(dir)

  /** State-table read, pruned to partitions committed strictly before `s`
    * (a crashed rerun of day `s` must not see its own partial partition). */
  private def stateBefore(spark: SparkSession, dir: String, s: java.sql.Date): DataFrame =
    spark.read.parquet(dir).filter(col("run_d") < lit(s)).drop("run_d")

  /** Bootstrap the workspace from the connector: one bulk fetch of
    * everything up to and including `cutoff` (the reference's initial
    * backfill), bars + full CCI written as the `run_d=cutoff` partitions. */
  def bootstrap(spark: SparkSession, conn: EventConnector, ws: Workspace,
      cutoff: java.sql.Date, cfg: GridConfig = GridConfig()): Unit = {
    import spark.implicits._
    val requests = conn.listKeys(spark, cutoff).select($"user_id",
      lit(CciPipeline.DefaultFetchStart).cast("date").as("fetch_start"),
      lit(cutoff).as("fetch_end"))
    val bars = GraftSession.maybeCache(
      CciPipeline.barsFromEvents(conn.fetch(spark, requests)))
    try {
      require(bars.limit(1).count() > 0,
        s"daily bootstrap: no events on or before $cutoff — nothing to resume from")
      overwrite(bars, s"${ws.barsDir}/run_d=$cutoff")
      overwrite(CciPipeline.cciFromBars(bars, cfg), s"${ws.cciDir}/run_d=$cutoff")
    } finally bars.unpersist()
  }

  /** Persist the best-strategy dimension the order step consumes (the
    * reference's stored strategy table, refreshed on its own cadence by the
    * r06–r08 grid sim — daily runs read it, they don't rebuild it). */
  def writeConditions(spark: SparkSession, dir: String, ws: Workspace): Unit =
    overwrite(
      CciPipeline.bestOf(spark, dir)
        .filter(col("investment_target") === "win_rate")
        .drop("investment_target"),
      ws.conditionsDir)

  /** Latest per-series state from the CCI table — current and previous
    * open-CCI plus the latest close — recovered via the table's own `idx`
    * position state (one partial-aggregable max per series + a broadcast
    * join back), NOT a full per-series sort window. */
  private def latestState(cciState: DataFrame): DataFrame = {
    import cciState.sparkSession.implicits._
    val offs = cciState.groupBy($"user_id").agg(max($"idx").as("mi"))
    cciState
      .join(broadcast(offs), Seq("user_id"))
      .filter($"idx" >= $"mi" - 1)
      .groupBy($"user_id")
      .agg(
        max(when($"idx" === $"mi", $"d")).as("state_d"),
        max(when($"idx" === $"mi", $"close_pr")).as("close_pr"),
        max(when($"idx" === $"mi", $"close_cci")).as("close_cci"),
        max(when($"idx" === $"mi", $"open_cci")).as("current_open_cci"),
        max(when($"idx" === $"mi" - 1, $"open_cci")).as("yesterday_open_cci"))
  }

  /** Execute one run day: watermark → fetch → bars append → incremental CCI
    * → signal scan → orders → digest. Caller is responsible for the trading
    * -day gate and the already-committed check ([[run]] applies both). */
  def runDay(spark: SparkSession, conn: EventConnector, ws: Workspace,
      s: java.sql.Date, cfg: GridConfig = GridConfig(),
      withOrders: Boolean = false): DayDigest = {
    import spark.implicits._

    // r21's watermark arithmetic against the DURABLE bars state: saved keys
    // resume after their last saved day; keys new to the universe backfill
    // from DefaultFetchStart. Requests stay dimension-scale by contract.
    val saved = stateBefore(spark, ws.barsDir, s)
      .groupBy($"user_id").agg(max($"d").as("saved_max"))
    val requests = conn.listKeys(spark, s)
      .join(saved, Seq("user_id"), "left")
      .select($"user_id",
        coalesce(date_add($"saved_max", 1),
          lit(CciPipeline.DefaultFetchStart).cast("date")).as("fetch_start"),
        lit(s).as("fetch_end"))
      .filter($"fetch_start" <= $"fetch_end")

    // The fetch is consumed exactly once (by the bars aggregation), so it
    // is neither cached nor counted: n_fetched == sum of bar volumes (each
    // event lands in exactly one bar), and the r32 oracle re-derives
    // n_fetched from the RAW events independently — the digest can't hide
    // a bars-aggregation bug behind this identity.
    val fetched = conn.fetch(spark, requests)
    locally {
      val deltaBars = GraftSession.maybeCache(CciPipeline.barsFromEvents(fetched))
      try {
        val Seq(nBarsNew, nFetched) = deltaBars
          .agg(count(lit(1)), coalesce(sum($"volume"), lit(0L))).head()
          .toSeq.map(_.asInstanceOf[Long])
        overwrite(deltaBars, s"${ws.barsDir}/run_d=$s")

        val baseCci = stateBefore(spark, ws.cciDir, s)
        val deltaCci = GraftSession.maybeCache(
          CciPipeline.cciIncrementalDelta(baseCci, deltaBars, cfg)
            .select(baseCci.columns.map(col): _*))
        try {
          val nCciNew = deltaCci.count()
          overwrite(deltaCci, s"${ws.cciDir}/run_d=$s")

          val cciState = baseCci.unionByName(deltaCci)
          val Array(nCciTotal, nSeries) = cciState
            .agg(count(lit(1)), countDistinct($"user_id")).head()
            .toSeq.map(_.asInstanceOf[Long]).toArray

          val latest = GraftSession.maybeCache(latestState(cciState))
          try {
            // r05/r09's crossover rule over the literal threshold grid
            // (recommendation semantics: >= on the current side).
            val nSignals = latest
              .crossJoin(broadcast(BuyThresholds.toDF("buy_thr")))
              .filter($"yesterday_open_cci" < $"buy_thr" &&
                $"current_open_cci" >= $"buy_thr")
              .count()

            // r13's order sizing against the persisted conditions dim.
            val nOrders = if (!withOrders) 0L else {
              val orders = spark.read.parquet(ws.conditionsDir)
                .join(latest, Seq("user_id"))
                .filter($"yesterday_open_cci" < $"condition_buy_cci_threshold" &&
                  $"current_open_cci" >= $"condition_buy_cci_threshold")
                .withColumn("order_date", $"state_d")
                .withColumn("buy_order_price", $"close_pr")
                .withColumn("buy_order_qty",
                  when($"buy_order_price" =!= 0.0,
                    floor(floor(lit(Budget * BudgetFraction)) / $"buy_order_price" + 0.5)
                      .cast("long")))
                .filter($"buy_order_qty" >= 1)
                .withColumn("net_target_price",
                  floor(($"buy_order_price" * (lit(1.0) +
                    ($"condition_target_return" + TaxRate + FeeRate) / 100.0)) * 1.0 + 0.5) / 1.0)
                .withColumn("sell_signal",
                  when($"close_pr" > $"net_target_price", lit("reach_target"))
                    .when($"close_cci" <= $"condition_stop_loss_cci_threshold", lit("stop_loss"))
                    .otherwise(lit("pending")))
                .select($"user_id", $"order_date", $"buy_order_price", $"buy_order_qty",
                  $"condition_holding_days", $"condition_target_return",
                  $"condition_buy_cci_threshold", $"condition_stop_loss_cci_threshold",
                  $"win_rate", $"revenue_rate", $"net_target_price", $"sell_signal")
              overwrite(orders, s"${ws.ordersDir}/run_d=$s")
              spark.read.parquet(s"${ws.ordersDir}/run_d=$s").count()
            }

            val dig = DayDigest(s, nFetched, nBarsNew, nCciNew, nCciTotal,
              nSeries, nSignals, nOrders)
            // digest LAST: its _SUCCESS marker commits the day
            overwrite(Seq(dig).toDF(), s"${ws.digestDir}/run_d=$s")
            dig
          } finally latest.unpersist()
        } finally deltaCci.unpersist()
      } finally deltaBars.unpersist()
    }
  }

  private def digestCommitted(spark: SparkSession, ws: Workspace, s: java.sql.Date): Boolean = {
    val marker = new Path(s"${ws.digestDir}/run_d=$s", "_SUCCESS")
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(marker)
  }

  /** Run every trading day in [from, to]: the scheduler loop. Non-trading
    * days are skipped (the reference's `is_holiday` gate); days whose digest
    * already committed are resumed from their stored digest, so a restarted
    * schedule continues where it stopped. */
  def run(spark: SparkSession, conn: EventConnector, ws: Workspace,
      from: LocalDate, to: LocalDate, cfg: GridConfig = GridConfig(),
      withOrders: Boolean = false): Seq[DayDigest] = {
    import spark.implicits._
    Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(to))
      .filter(CciPipeline.isTradingDayLocal)
      .map { ld =>
        val s = java.sql.Date.valueOf(ld)
        if (digestCommitted(spark, ws, s))
          spark.read.parquet(s"${ws.digestDir}/run_d=$s").as[DayDigest].head()
        else runDay(spark, conn, ws, s, cfg, withOrders)
      }
      .toSeq
  }

  // ---------------------------------------------------------------- r32
  /** The driver-gated face of the daily run: bootstrap on everything before
    * the last week, then run the week's trading days incrementally in a
    * fresh workspace, and emit the per-day digests. The DuckDB oracle
    * recomputes every digest from scratch on the raw events — the gate
    * proves the persisted incremental chain (watermark → fetch → bars →
    * incremental CCI → signal scan) is indistinguishable, day by day, from
    * a full recompute. Key identities the oracle leans on: CCI state as of
    * day s ≡ the full-corpus CCI restricted to d ≤ s (trailing windows
    * never change under append), and each event row is fetched exactly once
    * — on the first trading day ≥ its date. */
  def dailyRunQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // shutdown-hook-cleaned workspace (Extras.tempDir): a bare
    // createTempDirectory would leak a full bars+cci+digest workspace
    // per verify/bench invocation in a long-lived session
    val ws = Workspace(graft.operators.Extras.tempDir("graft-daily-r32"))
    val conn = new LocalFileEventConnector(dir)
    val maxLd = Tables.events(spark, dir)
      .agg(max(to_date($"ts"))).head().getDate(0).toLocalDate
    val start = maxLd.minusDays(6)
    bootstrap(spark, conn, ws, java.sql.Date.valueOf(start.minusDays(1)))
    val digests = run(spark, conn, ws, start, maxLd)
    spark.createDataset(digests).toDF()
      .select($"d", $"n_fetched", $"n_cci_new", $"n_cci_total",
        $"n_series", $"n_buy_signals")
      .orderBy($"d")
  }

  val dailyRunSql: String = {
    val thrValues = BuyThresholds.map(t => s"($t)").mkString(", ")
    CciPipeline.cciCtes + ",\n" +
      s"""b2 AS (SELECT max(d) AS maxd, max(d) - 6 AS start_d FROM bars),
         |days AS (SELECT unnest(generate_series(start_d, maxd, INTERVAL 1 DAY))::DATE AS s FROM b2),
         |tdays AS (
         |  SELECT s FROM days
         |  WHERE (date_diff('day', DATE '1970-01-01', s) + 3) % 7 < 5
         |    AND day(s) % 7 <> 3),
         |sim AS (
         |  SELECT s, coalesce(lag(s) OVER (ORDER BY s),
         |                     (SELECT start_d - 1 FROM b2)) AS prev
         |  FROM tdays),
         |ev2 AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events_us),
         |fetched AS (
         |  SELECT sim.s, count(ev2.user_id) AS n_fetched
         |  FROM sim LEFT JOIN ev2 ON ev2.d > sim.prev AND ev2.d <= sim.s
         |  GROUP BY sim.s),
         |cstat AS (
         |  SELECT sim.s,
         |    count(cci.user_id) AS n_cci_total,
         |    count(CASE WHEN cci.d > sim.prev THEN 1 END) AS n_cci_new,
         |    count(DISTINCT cci.user_id) AS n_series
         |  FROM sim LEFT JOIN cci ON cci.d <= sim.s
         |  GROUP BY sim.s),
         |lat AS (
         |  SELECT sim.s, cci.user_id, max(cci.idx) AS mi
         |  FROM sim JOIN cci ON cci.d <= sim.s
         |  GROUP BY sim.s, cci.user_id),
         |cur AS (
         |  SELECT lat.s, lat.user_id, c1.open_cci AS cur_cci, c2.open_cci AS prev_cci
         |  FROM lat
         |  JOIN cci c1 ON c1.user_id = lat.user_id AND c1.idx = lat.mi
         |  LEFT JOIN cci c2 ON c2.user_id = lat.user_id AND c2.idx = lat.mi - 1),
         |sigs AS (
         |  SELECT cur.s, count(*) AS n_buy_signals
         |  FROM cur CROSS JOIN (VALUES $thrValues) t(thr)
         |  WHERE cur.prev_cci < t.thr AND cur.cur_cci >= t.thr
         |  GROUP BY cur.s)
         |SELECT sim.s AS d,
         |  coalesce(f.n_fetched, 0) AS n_fetched,
         |  coalesce(c.n_cci_new, 0) AS n_cci_new,
         |  coalesce(c.n_cci_total, 0) AS n_cci_total,
         |  coalesce(c.n_series, 0) AS n_series,
         |  coalesce(g.n_buy_signals, 0) AS n_buy_signals
         |FROM sim
         |LEFT JOIN fetched f ON f.s = sim.s
         |LEFT JOIN cstat c ON c.s = sim.s
         |LEFT JOIN sigs g ON g.s = sim.s
         |ORDER BY d""".stripMargin
  }
}
