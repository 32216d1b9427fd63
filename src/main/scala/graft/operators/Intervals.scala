package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Interval-overlap analytics WITHOUT a range join.
  *
  * Spark has no native interval/range join: the naive spellings are either
  * a non-equi theta join (planned as BroadcastNestedLoopJoin — a scan of
  * the fact per probe row) or a grid EXPLODE of every interval into its
  * covered days (fan-out ∝ interval length before the aggregation). Both
  * melt at 100 TB. The sweep-line form used here is the scale answer for
  * the common "how many intervals are active at time t" family:
  *
  *   1. each interval [s, e) contributes two DELTA rows: (s, +1), (e, -1)
  *      — a row-local projection, fan-out exactly 2 regardless of length;
  *   2. one partial-aggregable groupBy(day) collapses the 2N deltas onto
  *      the DATE DIMENSION (map-side combine does most of the work: the
  *      post-shuffle frame is at most one row per boundary day, a few
  *      thousand rows at ANY corpus scale);
  *   3. the running sum over the day dimension recovers the active count.
  *      This is the only window in the plan and it runs over the
  *      dimension-scale frame, never the corpus — the deliberate single
  *      partition is spelled non-foldably (`pmod(year(d), 1)`, SURVEY §5)
  *      so the window spec survives constant folding.
  *
  * The DuckDB oracle is the INDEPENDENT naive semantics — a non-equi
  * LEFT JOIN of every boundary day against every interval — so the gate
  * proves sweep-line ≡ range-join, not sweep-line ≡ itself.
  */
object Intervals {
  /** Deterministic per-order active window, derived in-query (the corpus
    * carries no end-date column): [orderdate, orderdate + 3 + key mod 28)
    * half-open, so every interval is 3–30 days and both engines derive
    * identical bounds from the same integer arithmetic. */
  private val HoldBaseDays = 3
  private val HoldModDays = 28

  // ---------------------------------------------------------------- q44
  /** Per-day count of active order windows via sweep-line delta encoding.
    * Output: one row per boundary day (a day where some interval opens or
    * closes) with the number of intervals covering it. */
  def intervalConcurrency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val iv = Tables.orders(spark, dir).select(
      to_date($"o_orderdate").as("s"),
      date_add(to_date($"o_orderdate"),
        (lit(HoldBaseDays) + pmod($"o_orderkey", lit(HoldModDays.toLong))).cast("int")).as("e"))
    val deltas = iv.select($"s".as("d"), lit(1L).as("delta"))
      .unionByName(iv.select($"e".as("d"), lit(-1L).as("delta")))
    // the ONE corpus-scale shuffle; partial aggregation collapses to the
    // day dimension map-side
    val dayDelta = deltas.groupBy($"d").agg(sum($"delta").as("dd"))
    // dimension-scale running sum; deliberate single partition, non-foldable
    val w = Window.partitionBy(pmod(year($"d"), lit(1)))
      .orderBy($"d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dayDelta.select($"d", sum($"dd").over(w).as("n_active")).orderBy($"d")
  }

  val intervalConcurrencySql: String =
    s"""WITH iv AS (
       |  SELECT CAST(o_orderdate AS DATE) AS s,
       |         CAST(o_orderdate AS DATE)
       |           + CAST($HoldBaseDays + o_orderkey % $HoldModDays AS INTEGER) AS e
       |  FROM orders),
       |days AS (
       |  SELECT DISTINCT d FROM (
       |    SELECT s AS d FROM iv UNION ALL SELECT e AS d FROM iv))
       |-- independent naive semantics: non-equi join day x interval
       |SELECT dy.d AS d, count(iv.s) AS n_active
       |FROM days dy LEFT JOIN iv ON iv.s <= dy.d AND dy.d < iv.e
       |GROUP BY dy.d
       |ORDER BY d""".stripMargin
}
