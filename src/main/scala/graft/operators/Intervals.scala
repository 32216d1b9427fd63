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

  // ---------------------------------------------------------------- q48
  /** General PAIRWISE range join via BIN BUCKETING + point-side salting —
    * the complement to q44: the sweep-line answers decomposable
    * per-axis-point aggregates, but a payload that needs the actual
    * (point, interval) PAIRS — here the single most expensive order
    * window covering each order's date (argmax with an exact tiebreak) —
    * requires the join itself, which Spark would otherwise plan as
    * BroadcastNestedLoopJoin (per-probe-row scans of the whole fact).
    *
    * The scalable spelling: bins of [[RangeBinDays]] days partition the
    * time axis; each interval replicates into its ≤ span/B+1 covering
    * bins, each point lands in exactly ONE bin, and an EQUI-join on the
    * bin key carries the residual `s <= p < e` predicate — every
    * qualifying pair meets exactly once (bins partition days), so no
    * dedup pass. Shuffle volume is N·(span/B+1) + N instead of N²; the
    * bin-key cardinality is days/B — it grows with the TIME RANGE, not
    * the corpus, so per-bin volume grows with data density. Two knobs
    * bound the task size: B itself (smaller B = more bins = less data
    * per bin, at the cost of more interval replication), and point-side
    * SALTING — points spread over [[RangeSaltBuckets]] sub-keys of their
    * bin by key-hash while intervals replicate into every sub-key, so a
    * task's input is ivPerBin + ptsPerBin/S. Aggregation (count, exact-
    * cent price mass, k=1 heap argmax) is partial-aggregable and
    * pipelines straight off the sort-merge join — the pair stream is
    * never materialized.
    *
    * Output per order: how many order windows cover its date, their
    * exact-cent price mass, and the covering order with the highest
    * totalprice (ties to the higher key — mirrored in the oracle). */
  private val RangeBinDays = 16
  private val RangeSaltBuckets = 8
  /** Probe every 10th order: the row demonstrates the pairwise JOIN plan;
    * an all-points probe at sf0.1 is ~154M matched pairs of plain
    * arithmetic (measured ~7.5 s at 32 cores, ~20M pairs/s — honest but
    * uninformative sweep weight). The interval side stays the FULL
    * corpus, so the bin/salt/residual machinery is exercised unreduced. */
  private val RangeProbeMod = 10L

  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val iv = orders.select(
      $"o_orderkey".as("ikey"),
      unix_date(to_date($"o_orderdate")).cast("long").as("sd"),
      (unix_date(to_date($"o_orderdate")).cast("long") + lit(HoldBaseDays.toLong)
        + pmod($"o_orderkey", lit(HoldModDays.toLong))).as("ed"),
      graft.functions.Money.cents($"o_totalprice").as("pc"))
    val ivBinned = iv
      .withColumn("bin", explode(sequence(
        floor($"sd" / RangeBinDays), floor(($"ed" - 1) / RangeBinDays))))
      .withColumn("salt", explode(sequence(lit(0), lit(RangeSaltBuckets - 1))))
      // the (bin, salt) hash exchange IS the operator's distribution: the
      // pair-streaming join+aggregate stage must fan out over it — a
      // dense corpus read from few splits would otherwise stream EVERY
      // matched pair through the input's own handful of tasks (measured:
      // 190 s single-task vs seconds distributed at sf0.1). The partition
      // count is EXPLICIT: AQE sizes coalescing by the shuffle's own
      // bytes, which are tiny relative to the ~70× join fan-out behind
      // them, so an unpinned repartition gets coalesced right back into
      // the straggler (measured: 34 s coalesced vs explicit). At cluster
      // scale a shuffle join on (bin, salt) needs this exchange anyway,
      // so ENSURE_REQUIREMENTS reuses rather than duplicates it.
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("bin"), col("salt"))
    val pt = orders.filter(pmod($"o_orderkey", lit(RangeProbeMod)) === 0)
      .select($"o_orderkey",
        unix_date(to_date($"o_orderdate")).cast("long").as("pd"))
      .withColumn("bin", floor($"pd" / RangeBinDays))
      .withColumn("salt",
        pmod(xxhash64($"o_orderkey"), lit(RangeSaltBuckets.toLong)).cast("int"))
    val tk = graft.functions.catalyst.GraftColumns.topk_by_ord _
    pt.join(ivBinned,
        pt("bin") === ivBinned("bin") && pt("salt") === ivBinned("salt") &&
          $"sd" <= $"pd" && $"pd" < $"ed")
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_cover"),
        (sum($"pc").cast("double") / 100.0).as("cover_price"),
        get(tk(struct(bitwise_not($"pc").as("np"), bitwise_not($"ikey").as("nk")),
          $"ikey", 1), lit(0)).as("top_order"))
      .orderBy($"o_orderkey")
  }

  val rangeJoinSql: String =
    s"""WITH iv AS (
       |  SELECT o_orderkey AS ikey,
       |         CAST(o_orderdate AS DATE) AS s,
       |         CAST(o_orderdate AS DATE)
       |           + CAST($HoldBaseDays + o_orderkey % $HoldModDays AS INTEGER) AS e,
       |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS pc
       |  FROM orders),
       |pt AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS pd
       |       FROM orders WHERE o_orderkey % $RangeProbeMod = 0),
       |j AS (
       |  SELECT pt.o_orderkey AS k, iv.ikey, iv.pc
       |  FROM pt JOIN iv ON iv.s <= pt.pd AND pt.pd < iv.e),
       |ag AS (
       |  SELECT k, count(*) AS n_cover, CAST(sum(pc) AS DOUBLE) / 100.0 AS cover_price
       |  FROM j GROUP BY k),
       |tp AS (
       |  SELECT k, ikey AS top_order FROM (
       |    SELECT k, ikey,
       |      row_number() OVER (PARTITION BY k ORDER BY pc DESC, ikey DESC) AS rn
       |    FROM j) WHERE rn = 1)
       |SELECT ag.k AS o_orderkey, n_cover, cover_price, top_order
       |FROM ag JOIN tp ON ag.k = tp.k
       |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q49
  /** INTERVAL × INTERVAL overlap join via MEET-ONCE bin assignment — the
    * third member of the family (q44: decomposable aggregate by sweep-
    * line; q48: point×interval pairs; q49: interval×interval pairs).
    * Overlap([s1,e1), [s2,e2)) ⇔ s1 < e2 AND s2 < e1. Both sides explode
    * into their covering bins, so an overlapping pair shares every bin
    * their intersection touches — naively that double-counts. The
    * meet-once rule: credit the pair ONLY in the bin containing
    * max(s1, s2). That day lies inside BOTH intervals (it is ≥ both
    * starts, and < min(e1,e2) because the overlap is non-empty), so the
    * bin is present in both explosions, and it is unique — one extra
    * equi-residual conjunct replaces a whole dedup shuffle. Salting:
    * the SMALLER side (order windows) replicates into every salt bucket
    * while the bigger side (ship windows) hash-salts, so per-task input
    * is owPerBin·1 + swPerBin/S.
    *
    * Semantics on the sf tables: for every 10th order window, the
    * deterministic ship-transit windows ([l_shipdate, +1 + lkey mod 14)
    * over every 10th part's lineitems) that overlap it — count, exact-
    * cent price mass, and the single most expensive overlapping line
    * (k=1 heap argmax, exact (price, lkey) tiebreak). */
  private val ShipBaseDays = 1
  private val ShipModDays = 14

  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ow = Tables.orders(spark, dir)
      .filter(pmod($"o_orderkey", lit(RangeProbeMod)) === 0)
      .select($"o_orderkey",
        unix_date(to_date($"o_orderdate")).cast("long").as("s1"),
        (unix_date(to_date($"o_orderdate")).cast("long") + lit(HoldBaseDays.toLong)
          + pmod($"o_orderkey", lit(HoldModDays.toLong))).as("e1"))
    val owB = ow
      .withColumn("bin", explode(sequence(
        floor($"s1" / RangeBinDays), floor(($"e1" - 1) / RangeBinDays))))
      .withColumn("salt", explode(sequence(lit(0), lit(RangeSaltBuckets - 1))))
    val sw = Tables.lineitem(spark, dir)
      .filter(pmod($"l_partkey", lit(RangeProbeMod)) === 0)
      .select(($"l_orderkey" * 10 + $"l_linenumber").cast("long").as("lkey"),
        graft.functions.Money.cents($"l_extendedprice").as("lpc"),
        unix_date(to_date($"l_shipdate")).cast("long").as("s2"))
      .withColumn("e2", $"s2" + lit(ShipBaseDays.toLong) + pmod($"lkey", lit(ShipModDays.toLong)))
    val swB = sw
      .withColumn("bin", explode(sequence(
        floor($"s2" / RangeBinDays), floor(($"e2" - 1) / RangeBinDays))))
      .withColumn("salt", pmod(xxhash64($"lkey"), lit(RangeSaltBuckets.toLong)).cast("int"))
      // same pinned fan-out exchange as q48 (AQE would coalesce it away)
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("bin"), col("salt"))
    val tk = graft.functions.catalyst.GraftColumns.topk_by_ord _
    owB.join(swB, owB("bin") === swB("bin") && owB("salt") === swB("salt") &&
        $"s1" < $"e2" && $"s2" < $"e1" &&
        swB("bin") === floor(greatest($"s1", $"s2") / RangeBinDays))
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_overlap"),
        (sum($"lpc").cast("double") / 100.0).as("overlap_price"),
        get(tk(struct(bitwise_not($"lpc").as("np"), bitwise_not($"lkey").as("nk")),
          $"lkey", 1), lit(0)).as("top_line"))
      .orderBy($"o_orderkey")
  }

  val intervalJoinSql: String =
    s"""WITH ow AS (
       |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s1,
       |         CAST(o_orderdate AS DATE)
       |           + CAST($HoldBaseDays + o_orderkey % $HoldModDays AS INTEGER) AS e1
       |  FROM orders WHERE o_orderkey % $RangeProbeMod = 0),
       |sw AS (
       |  SELECT l_orderkey * 10 + l_linenumber AS lkey,
       |         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS lpc,
       |         CAST(l_shipdate AS DATE) AS s2,
       |         CAST(l_shipdate AS DATE)
       |           + CAST($ShipBaseDays + (l_orderkey * 10 + l_linenumber) % $ShipModDays AS INTEGER) AS e2
       |  FROM lineitem WHERE l_partkey % $RangeProbeMod = 0),
       |j AS (
       |  SELECT ow.o_orderkey AS k, sw.lkey, sw.lpc
       |  FROM ow JOIN sw ON ow.s1 < sw.e2 AND sw.s2 < ow.e1),
       |ag AS (
       |  SELECT k, count(*) AS n_overlap, CAST(sum(lpc) AS DOUBLE) / 100.0 AS overlap_price
       |  FROM j GROUP BY k),
       |tp AS (
       |  SELECT k, lkey AS top_line FROM (
       |    SELECT k, lkey,
       |      row_number() OVER (PARTITION BY k ORDER BY lpc DESC, lkey DESC) AS rn
       |    FROM j) WHERE rn = 1)
       |SELECT ag.k AS o_orderkey, n_overlap, overlap_price, top_line
       |FROM ag JOIN tp ON ag.k = tp.k
       |ORDER BY 1""".stripMargin

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
