package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** r39: the daily run's Slack notification FEED as a queryable table.
  *
  * The reference wires `send_simple_message` (slack_message.py:7) into four
  * seams of the daily product, all side-effecting prints of data the engine
  * already derives:
  *   1. the candidate-count message before the buy loop
  *      (`daily_function.py:1387` — "오늘의 전체 매수 후보 종목 수 : N"),
  *   2. one message per candidate whose fresh crossover fires inside the
  *      buy loop (`daily_function.py:1456` — symbol, yesterday/current CCI
  *      rounded to 1 dp, the buy threshold, and the condition verdict; the
  *      loop iterates `candidate_list` only, `daily_function.py:1408`),
  *   3. the buy-signal count after the loop (`daily_function.py:1534`),
  *   4. the end-of-run summary of the best pipeline
  *      (`daily_function.py:1136` — the best frame's length; its wall-clock
  *      timestamp is replaced by the deterministic as-of run date, the same
  *      substitution r35 makes for `datetime.now()`).
  *
  * Re-expressed as ONE frame — (seq_group, user_id, kind, message) — the
  * feed becomes auditable and backfillable: "what would we have sent on day
  * X" is a query, which a fire-and-forget webhook can never answer. The
  * account-number prefix the reference interpolates (`cano`) is a config
  * seam, rendered as the fixed placeholder "local".
  *
  * Numbers render at FIXED scale (r37's rule): the reference prints Python
  * floats after `round(x, 1)`; both engine and oracle land the value on the
  * repo's half-up 1-dp grid and render via DECIMAL(38,1) so double printing
  * cannot fork between engines. Counts are exact BIGINTs.
  *
  * Scale shape: candidates and recommendations are series-DIMENSION frames
  * already co-partitioned on `user_id` by their own windows, so the buy
  * join adds no corpus shuffle; the three singleton messages are global
  * one-row aggregates (partial-aggregable) — no windows at all, so the
  * feed needs no ordering state and stays inside the PlanGuard invariant
  * by construction. */
object Notify {

  /** Half-up 1-dp grid + fixed-scale rendering — the `round(x, 1)` the
    * reference applies to CCIs before messaging (daily_function.py:1448). */
  private def dp1(c: Column): Column =
    (floor(c * 10.0 + 0.5) / 10.0).cast(DecimalType(38, 1)).cast("string")

  def notifyFeed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Round-16 optimization (guide §1.2 "don't compute things twice"):
    // the four feed branches all derive from the best-win table — reco,
    // cand, the two counts and the run-end row pulled the bestOf heap
    // aggregation SIX times through the union (Spark reuses exchanges
    // only for identical subplans, and the branches' pushed filters fork
    // them). Materialize the dimension-scale shared frames once — bw
    // (~|series| rows) and the joined buy feed (≤ |candidates| rows) —
    // and let every branch read the checkpoint. Semantics stay single-
    // sourced: recommendationsFrom/candidateFilterFrom are the r09/r10
    // bodies parameterized by the bw frame.
    val bw = graft.GraftSession.maybeEagerCheckpoint(
      CciPipeline.bestWinFrame(spark, dir))
    val reco = CciPipeline.recommendationsFrom(spark, dir, bw)
    val cand = graft.GraftSession.maybeEagerCheckpoint(
      CciPipeline.candidateFilterFrom(spark, bw).select($"user_id"))
    val buy0 = reco.join(cand, Seq("user_id"))
      .filter($"has_buy_signal" === 1)
      .select(
        lit(2L).as("seq_group"), $"user_id",
        lit("buy_signal").as("kind"),
        concat(
          lit("cano: local, symbol: "), $"user_id".cast("string"),
          lit(", 전날 CCI: "), dp1($"yesterday_open_cci"),
          lit(", 오늘 CCI: "), dp1($"current_open_cci"),
          lit(", 매수 기준 CCI: "), dp1($"condition_buy_cci_threshold"),
          lit(", 매수조건 성립여부 : true")).as("message"))
    val buy = graft.GraftSession.maybeEagerCheckpoint(buy0)
    def singleton(seq: Long, kind: String, message: Column)(agg: DataFrame) =
      agg.select(lit(seq).as("seq_group"),
        lit(null).cast("long").as("user_id"), lit(kind).as("kind"),
        message.as("message"))
    val candCount = singleton(1L, "candidate_count",
      concat(lit("오늘의 전체 매수 후보 종목 수 : "), $"n".cast("string")))(
      cand.agg(count(lit(1)).as("n")))
    val buyCount = singleton(3L, "buy_count",
      concat(lit("매수 신호 발생 종목 수 : "), $"n".cast("string")))(
      buy.agg(count(lit(1)).as("n")))
    val runEnd = singleton(4L, "run_end",
      concat(lit("End. process_all_stocks_with_save_optimized, DF length: "),
        $"n".cast("string"), lit(", run_d: "), $"as_of_d".cast("string")))(
      bw.agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(Tables.events(spark, dir)
          .agg(max(to_date($"ts")).as("as_of_d")))))
    candCount.unionByName(buy).unionByName(buyCount).unionByName(runEnd)
      .orderBy($"seq_group", $"user_id")
  }

  val notifyFeedSql: String = {
    def dbl1(c: String) =
      s"CAST(CAST(floor(($c) * 10.0 + 0.5) / 10.0 AS DECIMAL(38,1)) AS VARCHAR)"
    CciPipeline.recommendationsCtes + ",\n" +
      s"""nth AS (SELECT quantile_cont(win_rate, 0.7) AS q_win,
         |               quantile_cont(count_win, 0.3) AS q_cnt,
         |               quantile_cont(avg_days_held, 1.0) AS q_days FROM bw),
         |ncand AS (
         |  SELECT bw.user_id FROM bw, nth
         |  WHERE win_rate >= q_win AND count_win >= q_cnt AND avg_days_held <= q_days),
         |nbuy AS (
         |  SELECT CAST(2 AS BIGINT) AS seq_group, r.user_id,
         |    'buy_signal' AS kind,
         |    'cano: local, symbol: ' || CAST(r.user_id AS VARCHAR)
         |      || ', 전날 CCI: ' || ${dbl1("r.yesterday_open_cci")}
         |      || ', 오늘 CCI: ' || ${dbl1("r.current_open_cci")}
         |      || ', 매수 기준 CCI: ' || ${dbl1("r.condition_buy_cci_threshold")}
         |      || ', 매수조건 성립여부 : true' AS message
         |  FROM reco r JOIN ncand USING (user_id)
         |  WHERE r.has_buy_signal = 1)
         |SELECT CAST(1 AS BIGINT) AS seq_group, CAST(NULL AS BIGINT) AS user_id,
         |  'candidate_count' AS kind,
         |  '오늘의 전체 매수 후보 종목 수 : ' || CAST((SELECT count(*) FROM ncand) AS VARCHAR) AS message
         |UNION ALL SELECT seq_group, user_id, kind, message FROM nbuy
         |UNION ALL SELECT CAST(3 AS BIGINT), CAST(NULL AS BIGINT), 'buy_count',
         |  '매수 신호 발생 종목 수 : ' || CAST((SELECT count(*) FROM nbuy) AS VARCHAR)
         |UNION ALL SELECT CAST(4 AS BIGINT), CAST(NULL AS BIGINT), 'run_end',
         |  'End. process_all_stocks_with_save_optimized, DF length: '
         |    || CAST((SELECT count(*) FROM bw) AS VARCHAR)
         |    || ', run_d: ' || CAST((SELECT max(CAST(ts AS DATE)) FROM events_us) AS VARCHAR)
         |ORDER BY seq_group, user_id""".stripMargin
  }
}
