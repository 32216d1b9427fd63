package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational core: the engine's foundation queries (SURVEY.md §2 A-rows).
  *
  * Every query is declarative DataFrame API so Catalyst gets full predicate
  * pushdown / column pruning / join planning. Dim joins (region, nation,
  * supplier at ~KB scale) are explicitly broadcast; fact-fact joins shuffle
  * on their keys and rely on AQE for runtime coalescing.
  *
  * Float discipline (oracle parity): every derived float column is rounded
  * with `round(x, n)` using the same expression the DuckDB oracle uses, and
  * divisions are guarded with nullif-style `when` guards.
  */
object Relational {

  /** TPC-H Q1 style pricing summary: scan → filter → partial-agg groupBy. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("2000-12-31"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-31'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Selective filter + narrow projection — both must reach the parquet scan. */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1999-06-01") && $"l_discount" > lit(0.05))
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1999-06-01' AND l_discount > 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** TPC-H Q3 style shipping priority: 3-way join + agg + deterministic top-k. */
  def q03ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
    val orders = Tables.orders(spark, dir).filter($"o_orderdate" < lit("1998-01-01"))
    val lineitem = Tables.lineitem(spark, dir).filter($"l_shipdate" > lit("1998-01-01"))
    lineitem
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q03Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 style local-supplier volume: 6-table star join + agg. */
  def q05LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val nation = Tables.nation(spark, dir)
    val supplier = Tables.supplier(spark, dir)
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01") && $"o_orderdate" < lit("1998-01-01"))
    val lineitem = Tables.lineitem(spark, dir)
    lineitem
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supplier), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(customer), $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q05Sql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6 style forecast revenue: highly selective filter + single agg. */
  def q06ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01") && $"l_shipdate" < lit("1997-01-01") &&
        $"l_discount" >= lit(0.03) && $"l_discount" <= lit(0.07) && $"l_quantity" < lit(24))
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q06Sql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** Left-semi join (EXISTS): customers having a high-value open order. */
  def q07SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.orders(spark, dir)
      .filter($"o_totalprice" > lit(100000.0) && $"o_orderstatus" === "O")
    Tables.customer(spark, dir)
      .join(big, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val q07Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND o_totalprice > 100000.0 AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no recent order. */
  def q08AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recent = Tables.orders(spark, dir).filter($"o_orderdate" >= lit("2000-01-01"))
    Tables.customer(spark, dir)
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val q08Sql: String =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** ROLLUP multi-level aggregation over order status × priority. */
  def q09Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total_price"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val q09Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_price
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Window rank: top-3 orders per priority class (deterministic tiebreak). */
  def q10WindowRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"rn")
  }

  val q10Sql: String =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin

  /** Cumulative window sum + lag/lead over the events time series. */
  def q11RunningSum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .withColumn("run_sum", round(sum($"value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .withColumn("prev_value", lag($"value", 1).over(w))
      .withColumn("next_value", lead($"value", 1).over(w))
      .select($"user_id", $"event_id", $"value", $"run_sum", $"prev_value", $"next_value")
      .orderBy($"user_id", $"event_id")
  }

  val q11Sql: String =
    Tables.eventsOracleCte + "\n" +
    """SELECT user_id, event_id, value,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum,
      |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      |  lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
      |FROM events_us
      |ORDER BY user_id, event_id""".stripMargin

  /** Distinct-count profile per return flag, plus the top-3 most-lined
    * parts per flag. The top-k runs through a k=3 `graft_topk_ord` heap
    * over the exact-integer (line count DESC, partkey ASC) order — the
    * per-(flag, part) counts aggregate map-side on their own shuffle,
    * then the 3-row-per-flag result broadcasts back onto the 3-row
    * distinct-count frame; no window, no corpus re-shuffle. */
  def q12DistinctTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val dc = li
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        countDistinct($"l_orderkey").as("n_orders"))
    val tk = graft.functions.catalyst.GraftColumns.topk_by_ord _
    val top = li
      .groupBy($"l_returnflag", $"l_partkey")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"l_returnflag")
      .agg(tk(struct((-$"cnt").as("nc"), $"l_partkey"), $"l_partkey", 3).as("tp"))
      .select($"l_returnflag",
        get($"tp", lit(0)).as("top_part1"),
        get($"tp", lit(1)).as("top_part2"),
        get($"tp", lit(2)).as("top_part3"))
    dc.join(broadcast(top), Seq("l_returnflag"))
      .orderBy($"l_returnflag")
  }

  val q12Sql: String =
    """WITH dc AS (
      |  SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |    count(DISTINCT l_suppkey) AS n_supps, count(DISTINCT l_orderkey) AS n_orders
      |  FROM lineitem GROUP BY l_returnflag),
      |pc AS (
      |  SELECT l_returnflag, l_partkey, count(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |rk AS (
      |  SELECT l_returnflag, l_partkey,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY cnt DESC, l_partkey) AS rn
      |  FROM pc),
      |tp AS (
      |  SELECT l_returnflag,
      |    max(CASE WHEN rn = 1 THEN l_partkey END) AS top_part1,
      |    max(CASE WHEN rn = 2 THEN l_partkey END) AS top_part2,
      |    max(CASE WHEN rn = 3 THEN l_partkey END) AS top_part3
      |  FROM rk WHERE rn <= 3 GROUP BY l_returnflag)
      |SELECT dc.l_returnflag, n_parts, n_supps, n_orders,
      |  top_part1, top_part2, top_part3
      |FROM dc JOIN tp USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  /** Exact interpolated percentiles of order value per status.
    *
    * o_orderstatus has ~3 distinct values, so the built-in `percentile`
    * aggregate would collect ~1/3 of the corpus into one task's buffer at
    * any scale. [[Quantiles.exactGroupQuantiles]] computes the identical
    * answer through a range-partitioned distributed sort + rank
    * extraction — task memory O(1), parallelism ∝ corpus, not groups. */
  def q13Quantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    Quantiles.exactGroupQuantiles(
        Tables.orders(spark, dir), "o_orderstatus", "o_totalprice", qs)
      .groupBy($"g".as("o_orderstatus"))
      .pivot("q", qs)
      .agg(first($"value"))
      .select($"o_orderstatus",
        round(col("`0.25`"), 2).as("p25"),
        round(col("`0.5`"), 2).as("p50"),
        round(col("`0.75`"), 2).as("p75"),
        round(col("`0.95`"), 2).as("p95"))
      .orderBy($"o_orderstatus")
  }

  val q13Sql: String =
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
      |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
      |  round(quantile_cont(o_totalprice, 0.95), 2) AS p95
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Scalar-subquery compare: nations whose mean balance beats the global mean. */
  def q14CrossRef(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = Tables.customer(spark, dir)
    val global = customer.agg(avg($"c_acctbal").as("global_avg"))
    customer
      .groupBy($"c_nationkey")
      .agg(avg($"c_acctbal").as("nat_avg"), count(lit(1)).as("n_cust"))
      .crossJoin(broadcast(global))
      .filter($"nat_avg" > $"global_avg")
      .select($"c_nationkey", round($"nat_avg", 2).as("avg_bal"), $"n_cust")
      .orderBy($"c_nationkey")
  }

  val q14Sql: String =
    """SELECT c_nationkey, round(avg(c_acctbal), 2) AS avg_bal, count(*) AS n_cust
      |FROM customer
      |GROUP BY c_nationkey
      |HAVING avg(c_acctbal) > (SELECT avg(c_acctbal) FROM customer)
      |ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Per-order quantity total above this marks a large-volume order. */
  val Q26MinQty = 300L

  /** TPC-H Q18 style large-volume customers: HAVING-filtered aggregate
    * semi-reduction on the per-order quantity total, joined back to
    * orders and customer for the report. Quantities sum as exact integers
    * so both engines agree; the top-k rides a total ordering
    * (totalprice desc, date, orderkey).
    *
    * Scale shape: lineitem shuffles ONCE on orderkey for the HAVING
    * aggregate and arrives co-partitioned for the orders join; the
    * surviving order set is tiny (the filter is the point of Q18), so AQE
    * broadcasts it into the customer join rather than shuffling the full
    * customer table; the limit is a TakeOrdered, never a global sort. */
  def q26LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sum(floor($"l_quantity" + 0.5).cast("long")).as("sum_qty"))
      .filter($"sum_qty" > Q26MinQty)
    Tables.orders(spark, dir)
      .join(bigOrders, $"o_orderkey" === $"l_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
      .limit(100)
  }

  // ---------------------------------------------------------------- q27
  /** TPC-H Q2 spirit (no partsupp table in this schema): the cheapest
    * supplier per part derived from lineitem history — per (part,
    * supplier) minimum ROUNDED unit price, then keep-first argmin per
    * part via one min_by aggregation over the (price, suppkey) ordering
    * struct (the r08/r02 keep-first pattern; min is order-independent, so
    * no float-parity hazard). Scale shape: two hash aggregations sharing
    * the partkey shuffle, then broadcast-joined name lookups; no window,
    * no sort below the presentation ORDER BY. */
  def q27CheapestSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{TextFunctions => F}
    val ps = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min(F.fr($"l_extendedprice" / $"l_quantity", 2)).as("unit_price"))
    // k=1 heap, not struct-ordered min_by: the struct ordering would plan
    // this as SortAggregate (see CciPipeline.barAggs); the heap keeps the
    // ObjectHash path with the identical (price, suppkey) total order
    val best = ps.groupBy($"l_partkey")
      .agg(get(graft.functions.catalyst.GraftColumns.topk_by_ord(
        struct($"unit_price", $"l_suppkey"),
        struct($"l_suppkey", $"unit_price"), 1), lit(0)).as("b"))
      .select($"l_partkey", $"b.l_suppkey".as("best_suppkey"),
        $"b.unit_price".as("best_unit_price"))
    best
      .join(broadcast(Tables.part(spark, dir)), $"l_partkey" === $"p_partkey")
      .join(broadcast(Tables.supplier(spark, dir)), $"best_suppkey" === $"s_suppkey")
      .select($"p_partkey", $"p_name", $"best_suppkey", $"s_name", $"best_unit_price")
      .orderBy($"p_partkey")
  }

  val q27Sql: String = {
    import graft.functions.{TextSql => S}
    s"""WITH ps AS (
       |  SELECT l_partkey, l_suppkey,
       |    min(${S.fr("l_extendedprice / l_quantity", 2)}) AS unit_price
       |  FROM lineitem GROUP BY 1, 2),
       |best AS (
       |  SELECT l_partkey, l_suppkey AS best_suppkey,
       |    unit_price AS best_unit_price,
       |    row_number() OVER (PARTITION BY l_partkey
       |                       ORDER BY unit_price, l_suppkey) AS rn
       |  FROM ps)
       |SELECT p_partkey, p_name, best_suppkey, s_name, best_unit_price
       |FROM best
       |JOIN part ON p_partkey = l_partkey
       |JOIN supplier ON s_suppkey = best_suppkey
       |WHERE rn = 1
       |ORDER BY p_partkey""".stripMargin
  }

  val q26Sql: String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
       |FROM (SELECT l_orderkey,
       |        CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty
       |      FROM lineitem GROUP BY l_orderkey) b
       |JOIN orders ON o_orderkey = b.l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE sum_qty > $Q26MinQty
       |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
       |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q04
  /** "Late" for the Q4/Q21 shapes: this schema carries no commit/receipt
    * dates, so a line is late when it shipped more than N days after the
    * order date. */
  val Q04LateDays = 60
  val Q28LateDays = 90

  /** TPC-H Q4 shape: EXISTS-style left-semi join with a non-equi extra
    * predicate (lineitem shipped late for THAT order), then a count per
    * order priority. Scale shape: the date filter prunes orders at the
    * scan; the semi join shuffles both sides on orderkey ONCE and emits
    * at most one row per order (no fan-out, no distinct needed); the
    * priority agg is a 5-group partial-aggregable rollup. */
  def q04OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1997-01-01") && $"o_orderdate" < lit("1997-07-01"))
    val l = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_shipdate")
    o.join(l, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr(s"INTERVAL $Q04LateDays DAYS"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q04Sql: String =
    s"""SELECT o_orderpriority, count(*) AS order_count
       |FROM orders
       |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
       |  AND EXISTS (SELECT 1 FROM lineitem
       |              WHERE l_orderkey = o_orderkey
       |                AND l_shipdate > o_orderdate + INTERVAL $Q04LateDays DAY)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q28
  /** TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    * multi-supplier order. The classic formulation is EXISTS + NOT EXISTS
    * against the same fact; re-expressed as two aggregations so the fact
    * is scanned once for each role and no correlated subquery fan-out
    * exists: (a) distinct late (order, supplier) pairs → orders with
    * exactly ONE late supplier (that supplier falls out of the same agg
    * as max over a 1-row group — no second pass); (b) distinct (order,
    * supplier) pairs → per-order supplier counts (two-level distinct, no
    * Expand). Both share the orderkey shuffle; supplier names broadcast;
    * the final top-k is a TakeOrdered, not a global sort. */
  def q28WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val late = li
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr(s"INTERVAL $Q28LateDays DAYS"))
      .select($"l_orderkey", $"l_suppkey").distinct()
    val sole = late.groupBy($"l_orderkey")
      .agg(max($"l_suppkey").as("waiter"), count(lit(1)).as("n_late"))
      .filter($"n_late" === 1)
    val nsupp = li.select($"l_orderkey", $"l_suppkey").distinct()
      .groupBy($"l_orderkey").agg(count(lit(1)).as("ns"))
      .filter($"ns" >= 2)
    sole.join(nsupp, Seq("l_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")),
        $"waiter" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(25)
  }

  val q28Sql: String =
    s"""WITH late AS (
       |  SELECT l_orderkey, l_suppkey
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_shipdate > o_orderdate + INTERVAL $Q28LateDays DAY
       |  GROUP BY 1, 2),
       |sole AS (
       |  SELECT l_orderkey, max(l_suppkey) AS waiter
       |  FROM late GROUP BY 1 HAVING count(*) = 1),
       |nsupp AS (
       |  SELECT l_orderkey, count(*) AS ns
       |  FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) GROUP BY 1)
       |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
       |FROM sole JOIN nsupp USING (l_orderkey)
       |JOIN supplier ON s_suppkey = waiter
       |WHERE ns >= 2
       |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 25""".stripMargin

  // ---------------------------------------------------------------- q29
  /** Q8 market-share parameters: the share of PROMO-part volume supplied
    * by the target nation, per order year. */
  val Q29PartType = "PROMO"
  val Q29Nation = "NATION_7"

  /** TPC-H Q8 shape: conditional-share aggregation over a star join.
    * Float discipline: volume = price × (1 − discount) is summed as exact
    * integer ten-thousandths (cents × hundredths) so the two engines'
    * reduction orders cannot diverge; ONE double division at the end.
    * Scale shape: part (filtered), supplier and nation broadcast; the only
    * fact-fact shuffle is lineitem ⨝ orders on orderkey; the year rollup
    * is 7 groups, fully partial-aggregable. (The bigint volume sum holds
    * ~9e15 / 1e9-per-row ≈ 10M rows per (year) group per exact double
    * representability — far beyond any realistic per-group volume once
    * partials combine; overflow of the int64 itself needs 9e18.) */
  def q29MarketShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{TextFunctions => F}
    def cents(c: Column): Column = floor(c * 100 + 0.5).cast("long")
    val vol = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.part(spark, dir)
        .filter($"p_type" === Q29PartType).select($"p_partkey")),
        $"l_partkey" === $"p_partkey")
      .join(broadcast(Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, dir).select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select(year($"o_orderdate").as("o_year"),
        (cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))).as("v"),
        $"n_name")
    vol.groupBy($"o_year")
      .agg(F.fr(
        sum(when($"n_name" === Q29Nation, $"v").otherwise(0L)).cast("double")
          / sum($"v").cast("double"), 4).as("mkt_share"))
      .orderBy($"o_year")
  }

  val q29Sql: String = {
    import graft.functions.{TextSql => S}
    s"""WITH vol AS (
       |  SELECT year(o_orderdate) AS o_year,
       |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS v,
       |    n_name
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN part ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation ON n_nationkey = s_nationkey
       |  WHERE p_type = '$Q29PartType')
       |SELECT o_year,
       |  ${S.fr(s"CAST(sum(CASE WHEN n_name = '$Q29Nation' THEN v ELSE 0 END) AS DOUBLE) / CAST(sum(v) AS DOUBLE)", 4)} AS mkt_share
       |FROM vol GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
