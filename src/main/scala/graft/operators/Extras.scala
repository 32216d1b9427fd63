package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Additional engine-surface coverage (SURVEY.md §2): pivot, embedded-JSON
  * extraction, interval range-frame windows, and non-parquet source IO. */
object Extras {
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Temp sink directory with best-effort cleanup at JVM exit (the
    * round-trip/sink operators would otherwise leak directories in a
    * long-lived session; deletion can't happen earlier because the
    * returned DataFrames read the files lazily). */
  private[graft] def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(); ()
      }
      del(p.toFile)
    }))
    p.toString
  }

  // ---------------------------------------------------------------- q15
  /** Pivot event counts per user (explicit value list → deterministic
    * schema; nulls coalesced to 0 to match the oracle's conditional agg). */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.events(spark, dir)
      .groupBy($"user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    p.select($"user_id" +: EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy($"user_id")
  }

  val pivotCountsSql: String =
    Tables.eventsOracleCte + "\n" +
      s"""SELECT user_id,
         |${EventTypes.map(t => s"  CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t").mkString(",\n")}
         |FROM events_us
         |GROUP BY user_id
         |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Embedded-JSON column extraction (`props` carries `{"k": <int>}`):
    * parse, type, aggregate. The oracle extracts the same value with a
    * regexp so it does not depend on DuckDB's JSON extension. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").cast("long").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val jsonExtractSql: String =
    Tables.eventsOracleCte + "\n" +
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(regexp_extract(props, '\{"k": ([0-9]+)\}', 1) AS INTEGER)) AS BIGINT) AS sum_k,
        |  min(CAST(regexp_extract(props, '\{"k": ([0-9]+)\}', 1) AS INTEGER)) AS min_k,
        |  max(CAST(regexp_extract(props, '\{"k": ([0-9]+)\}', 1) AS INTEGER)) AS max_k
        |FROM events_us
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Interval range-frame window: per customer, trailing-30-day order
    * count and value at each order. Value totals sum exact integer cents
    * inside the frame so both engines agree bit-for-bit. */
  def rangeWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // NTZ timestamp → epoch seconds via the UTC session: matches the
    // oracle's epoch(o_orderdate) on the naive timestamp.
    val w = Window.partitionBy($"o_custkey")
      .orderBy(unix_seconds($"o_orderdate".cast("timestamp")))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(spark, dir)
      .withColumn("n_30d", count(lit(1)).over(w))
      .withColumn("cents_30d", sum(floor($"o_totalprice" * 100.0 + 0.5).cast("long")).over(w))
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"n_30d",
        ($"cents_30d".cast("double") / 100.0).as("total_30d"))
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  val rangeWindowSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  count(*) OVER w AS n_30d,
      |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER w AS DOUBLE) / 100.0 AS total_30d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
      |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Correlated-aggregate filter (TPC-H Q17 shape): lineitems below 20% of
    * their part's mean quantity. Quantities are integral so the per-part
    * mean is engine-exact; revenue sums exact cents. */
  def correlatedAvg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"l_partkey")
    Tables.lineitem(spark, dir)
      .withColumn("avg_qty", avg($"l_quantity").over(w))
      .filter($"l_quantity" < $"avg_qty" * 0.2)
      .agg(count(lit(1)).as("n"),
        countDistinct($"l_partkey").as("n_parts"),
        (sum(floor($"l_extendedprice" * 100.0 + 0.5).cast("long")).cast("double") / 100.0).as("total_price"))
  }

  val correlatedAvgSql: String =
    """SELECT count(*) AS n, count(DISTINCT l_partkey) AS n_parts,
      |  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
      |FROM lineitem l
      |WHERE l_quantity < 0.2 * (SELECT avg(x.l_quantity) FROM lineitem x
      |                          WHERE x.l_partkey = l.l_partkey)""".stripMargin

  // ---------------------------------------------------------------- q20
  /** ntile bucketing: order-value quartiles per status (total ordering via
    * orderkey tiebreak keeps bucket assignment engine-identical). */
  def ntileBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("bucket", ntile(4).over(w))
      .groupBy($"o_orderstatus", $"bucket")
      .agg(count(lit(1)).as("n"),
        (sum(floor($"o_totalprice" * 100.0 + 0.5).cast("long")).cast("double") / 100.0).as("total_value"))
      .orderBy($"o_orderstatus", $"bucket")
  }

  val ntileBucketsSql: String =
    """SELECT o_orderstatus, bucket, count(*) AS n,
      |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
      |FROM (SELECT o_orderstatus, o_totalprice,
      |        ntile(4) OVER (PARTITION BY o_orderstatus
      |                       ORDER BY o_totalprice, o_orderkey) AS bucket
      |      FROM orders) t
      |GROUP BY o_orderstatus, bucket
      |ORDER BY o_orderstatus, bucket""".stripMargin

  // ---------------------------------------------------------------- q21
  /** CUBE aggregation over status x priority. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        (sum(floor($"o_totalprice" * 100.0 + 0.5).cast("long")).cast("double") / 100.0).as("total_price"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val cubeAggSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q25
  /** q25: explicit GROUPING SETS — the hand-picked grouping combinations
    * a report layer asks for when rollup/cube over-produce (here: totals
    * by status, by priority, and the grand total — but NOT the full
    * status×priority matrix). One Expand + one aggregation exactly like
    * rollup/cube; `grouping_id` disambiguates the all-null rows. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq.empty),
        $"o_orderstatus", $"o_orderpriority")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        (sum(floor($"o_totalprice" * 100.0 + 0.5).cast("long")).cast("double") / 100.0).as("total_price"))
      .select($"o_orderstatus", $"o_orderpriority", $"gid", $"n_orders", $"total_price")
      .orderBy($"gid", $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val groupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Time-dimension histogram: events by day-of-week x hour. Engines
    * disagree on dayofweek() numbering, so dow is computed from epoch days
    * as (days + 3) % 7 with Monday = 0 (1970-01-01 was a Thursday, so
    * epoch day 0 maps to 3) with identical arithmetic on both sides. */
  def timeDims(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val epochDays = floor(unix_micros($"ts") / lit(86400000000L)).cast("long")
    Tables.events(spark, dir)
      .withColumn("dow", (epochDays + 3) % 7) // 0 = Monday
      .withColumn("hour", floor((unix_micros($"ts") % 86400000000L) / 3600000000L).cast("long"))
      .groupBy($"dow", $"hour")
      .agg(count(lit(1)).as("n"),
        (sum(floor($"value" * 100.0 + 0.5).cast("long")).cast("double") / 100.0).as("total_value"))
      .orderBy($"dow", $"hour")
  }

  val timeDimsSql: String =
    Tables.eventsOracleCte + "\n" +
      """SELECT (CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) + 3) % 7 AS dow,
        |  CAST(floor((epoch_us(ts) % 86400000000) / 3600000000) AS BIGINT) AS hour,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
        |FROM events_us
        |GROUP BY 1, 2
        |ORDER BY dow, hour""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Set operations: INTERSECT / EXCEPT over customer cohorts. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val building = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val buyers = Tables.orders(spark, dir)
      .filter($"o_totalprice" > 50000.0).select($"o_custkey".as("c_custkey")).distinct()
    val both = building.intersect(buyers).withColumn("cohort", lit("building_buyer"))
    val only = building.except(buyers).withColumn("cohort", lit("building_only"))
    both.unionByName(only)
      .groupBy($"cohort").agg(count(lit(1)).as("n"))
      .orderBy($"cohort")
  }

  val setOpsSql: String =
    """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |buyers AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 50000.0),
      |u AS (
      |  SELECT c_custkey, 'building_buyer' AS cohort FROM (SELECT * FROM building INTERSECT SELECT * FROM buyers) x
      |  UNION ALL
      |  SELECT c_custkey, 'building_only' AS cohort FROM (SELECT * FROM building EXCEPT SELECT * FROM buyers) y)
      |SELECT cohort, count(*) AS n FROM u GROUP BY cohort ORDER BY cohort""".stripMargin

  // ---------------------------------------------------------------- q22
  /** As-of (point-in-time) join: each purchase event paired with the same
    * user's most recent prior view. Spark lacks a native ASOF JOIN; the
    * scale-correct composition is a single-shuffle window scan (running
    * max of the view timestamp over the interleaved event stream), not a
    * range self-join — O(n) per series instead of O(n·m). */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("last_view_ts", max(when($"event_type" === "view", $"ts")).over(w))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"),
        $"value".as("purchase_value"), $"last_view_ts",
        (unix_micros($"ts") - unix_micros($"last_view_ts")).as("view_to_purchase_us"))
      .orderBy($"user_id", $"purchase_id")
  }

  val asofJoinSql: String =
    Tables.eventsOracleCte + "\n" +
      """SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
        |  value AS purchase_value, last_view_ts,
        |  epoch_us(ts) - epoch_us(last_view_ts) AS view_to_purchase_us
        |FROM (
        |  SELECT *, max(CASE WHEN event_type = 'view' THEN ts END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
        |  FROM events_us) t
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, purchase_id""".stripMargin

  // ---------------------------------------------------------------- p01
  /** Column profiling: one row per numeric column with null/distinct/
    * min/max/total stats — the data-quality pass every ingest pipeline
    * runs before training. */
  def profileColumns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // ONE scan: unpivot the profiled columns map-side (stack = 4x row
    // fan-out, no shuffle), then a single grouped aggregation. A
    // per-column union would scan lineitem 4x; a single 4-countDistinct
    // aggregate would Expand every row 5x before the shuffle. The unpivot
    // keeps one scan and one distinct per group key.
    Tables.lineitem(spark, dir)
      .select(expr(s"stack(${cols.length}, " +
        cols.map(c => s"'$c', $c").mkString(", ") + ") AS (column_name, value)"))
      .groupBy($"column_name")
      .agg(
        count(lit(1)).as("n"),
        sum(when($"value".isNull, 1).otherwise(0)).cast("long").as("n_null"),
        countDistinct($"value").as("n_distinct"),
        min($"value").as("min_value"),
        max($"value").as("max_value"),
        (sum(floor($"value" * 10000.0 + 0.5).cast("long")).cast("double") / 10000.0).as("total"))
      .orderBy($"column_name")
  }

  val profileColumnsSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    cols.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  min($c) AS min_value, max($c) AS max_value,
         |  CAST(sum(CAST(floor($c * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS total
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  // ---------------------------------------------------------------- r16
  /** Partitioned-layout sink + pruned read: write events partitioned by
    * event_type, read back one partition — the filter must become a
    * PartitionFilter (directory pruning), the 100 TB answer to
    * "only scan what the query touches". Result is oracle-checked against
    * the unpartitioned table. */
  def partitionedSink(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = tempDir("graft_part")
    Tables.events(spark, dir)
      .withColumn("d", to_date($"ts"))
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val back = spark.read.parquet(out).filter($"event_type" === "purchase")
    // partition pruning must reach the scan, not just the filter operator
    val planStr = back.queryExecution.executedPlan.toString
    require(planStr.contains("PartitionFilters") || !planStr.contains("Filter"),
      "expected the partition filter to prune at the scan")
    back
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_purchases"),
        (sum(floor($"value" * 100.0 + 0.5).cast("long")).cast("double") / 100.0).as("total_value"))
      .orderBy($"user_id")
  }

  val partitionedSinkSql: String =
    graft.sources.Tables.eventsOracleCte + "\n" +
      """SELECT user_id, count(*) AS n_purchases,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
        |FROM events_us
        |WHERE event_type = 'purchase'
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- r19
  /** Latest-snapshot selection (reference get_latest_best_file,
    * daily_function.py:1140: scan a directory of dated files, pick the
    * newest by the date embedded in the name, and read only it before the
    * recommendation join). Spark-native analogue: a date-partitioned sink,
    * max-partition discovery from the directory listing (a driver-side
    * metadata op — the reference's os.listdir), then a partition-pruned
    * read of ONLY the newest partition, asserted on the physical plan.
    * At 100 TB this reads one day of a multi-year table. */
  def latestSnapshot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = tempDir("graft_snap")
    Tables.events(spark, dir)
      .withColumn("snap_d", to_date($"ts"))
      .write.mode("overwrite").partitionBy("snap_d").parquet(out)
    // Max-partition discovery: directory names only, no data scanned.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(out), spark.sparkContext.hadoopConfiguration)
    val latest = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("snap_d=")).map(_.stripPrefix("snap_d=")).max
    val back = spark.read.parquet(out).filter($"snap_d" === lit(latest).cast("date"))
    // The filter must prune to the ONE newest partition at the scan
    // (inputFiles would not do: it lists the relation before pruning).
    val scans = back.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    require(scans.nonEmpty, "expected a file scan")
    require(scans.head.selectedPartitions.partitionCount == 1,
      s"expected to scan only partition snap_d=$latest, got " +
        s"${scans.head.selectedPartitions.partitionCount} partitions")
    back
      .groupBy($"snap_d", $"event_type")
      .agg(count(lit(1)).as("n"),
        (sum(floor($"value" * 100.0 + 0.5).cast("long")).cast("double") / 100.0).as("total_value"))
      .orderBy($"event_type")
  }

  val latestSnapshotSql: String =
    graft.sources.Tables.eventsOracleCte + "\n" +
      """SELECT CAST(ts AS DATE) AS snap_d, event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
        |FROM events_us
        |WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events_us)
        |GROUP BY 1, 2
        |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- r17
  /** Incremental aggregate maintenance: partial aggregates from a snapshot
    * (first 20 days) and a delta batch (the rest) merge to exactly the
    * full recompute — the mergeable-state property (sums/counts in exact
    * cents) that lets a 100 TB rollup update from deltas instead of
    * rescanning history. The oracle IS the full recompute. */
  def incrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    // The cutoff is a 1-row aggregate broadcast into both branches — no
    // driver-side .head action, so the whole maintenance run stays one job.
    val cutoff = ev.agg(date_add(min(to_date($"ts")), 20).as("cutoff"))
    def partial(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(floor($"value" * 100.0 + 0.5).cast("long")).as("cents"))
    val tagged = ev.crossJoin(broadcast(cutoff))
    val snap = partial(tagged.filter(to_date($"ts") < $"cutoff"))
    val delta = partial(tagged.filter(to_date($"ts") >= $"cutoff"))
    snap.unionByName(delta)
      .groupBy($"user_id")
      .agg(sum($"n").as("n_events"),
        (sum($"cents").cast("double") / 100.0).as("total_value"))
      .orderBy($"user_id")
  }

  val incrementalMergeSql: String =
    graft.sources.Tables.eventsOracleCte + "\n" +
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
        |FROM events_us
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- p02
  /** Deterministic hash-based train/test split (Knuth multiplicative on
    * the stable id — identical bucketing on any engine, stable across
    * reshuffles/re-runs, the property random splits lack at scale). */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Reduce mod 1e8 BEFORE the Knuth multiply: 1e8 * 2654435761 ≈ 2.7e17
    // stays inside Int64, so the bucketing never overflows (ANSI mode
    // throws on overflow) no matter how large doc_id grows at 100 TB.
    val bucket = pmod(pmod($"doc_id", lit(100000000L)) * 2654435761L, lit(100L))
    Tables.documents(spark, dir)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        countDistinct($"lang").as("n_langs"))
      .orderBy($"split")
  }

  val trainTestSplitSql: String =
    """SELECT split, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  count(DISTINCT lang) AS n_langs
      |FROM (SELECT *,
      |        CASE WHEN ((doc_id % 100000000) * 2654435761) % 100 < 80 THEN 'train'
      |             WHEN ((doc_id % 100000000) * 2654435761) % 100 < 90 THEN 'valid'
      |             ELSE 'test' END AS split
      |      FROM documents) t
      |GROUP BY split
      |ORDER BY split""".stripMargin

  // ---------------------------------------------------------------- r14
  /** JSON-lines sink+source round-trip (same contract as r12 for the
    * second-most-common interchange format). */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = tempDir("graft_json")
    Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("2000-01-01"))
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    spark.read.schema(schema).json(out)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        (sum(floor($"o_totalprice" * 100.0 + 0.5).cast("long")).cast("double") / 100.0).as("total_price"))
      .orderBy($"o_orderstatus")
  }

  val jsonRoundtripSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '2000-01-01'
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- r12
  /** CSV source round-trip: write a projection out as CSV, read it back
    * with an explicit schema, aggregate. Exercises the non-parquet IO path
    * end to end (Java's shortest-repr double formatting round-trips
    * exactly, so the oracle can aggregate the original table). */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = tempDir("graft_csv")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("2000-01-01"))
      .select($"l_orderkey", $"l_returnflag", $"l_quantity", $"l_extendedprice")
      .write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_returnflag", StringType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType)))
    spark.read.schema(schema).option("header", "true").csv(out)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(floor($"l_quantity" * 100.0 + 0.5).cast("long")).as("qty_cents"),
        sum(floor($"l_extendedprice" * 100.0 + 0.5).cast("long")).as("price_cents"))
      .select($"l_returnflag", $"n",
        ($"qty_cents".cast("double") / 100.0).as("total_qty"),
        ($"price_cents".cast("double") / 100.0).as("total_price"))
      .orderBy($"l_returnflag")
  }

  val csvRoundtripSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2000-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- r24
  /** r24: ORC roundtrip — the third columnar format a warehouse-facing
    * library must speak (parquet is the native store, CSV/JSON the
    * interchange edges — r12/r14). Values survive the ORC writer/reader
    * bit-exactly (doubles, strings, timestamps-as-dates), which the oracle
    * checks by aggregating the same rows straight from the source table:
    * any roundtrip lossiness would hash-mismatch. ORC's predicate pushdown
    * profile mirrors parquet's, so the scan-side posture (§5) carries
    * over. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = tempDir("graft_orc")
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
        to_date($"o_orderdate").as("o_date"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(floor($"o_totalprice" * 100.0 + 0.5).cast("long")).as("price_cents"),
        min($"o_date").as("first_date"), max($"o_date").as("last_date"))
      .select($"o_orderstatus", $"n",
        ($"price_cents".cast("double") / 100.0).as("total_price"),
        $"first_date", $"last_date")
      .orderBy($"o_orderstatus")
  }

  val orcRoundtripSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price,
      |  min(CAST(o_orderdate AS DATE)) AS first_date,
      |  max(CAST(o_orderdate AS DATE)) AS last_date
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- r28
  /** r28: schema evolution on read — the lake-maintenance reality that a
    * long-lived table's early files lack columns added later. An "old
    * generation" (orderkey, quantity) and a "new generation" (plus
    * extendedprice) land as parquet under one root; `mergeSchema=true`
    * unions the schemas at read time, null-filling the missing column in
    * old files. The verification aggregate proves the null-fill: rows per
    * generation, exact quantity sums over BOTH, and a price sum that only
    * the new generation contributes to. At scale mergeSchema's footer
    * union runs distributed (one task per file footer) — no driver scan;
    * the steady-state alternative (a table catalog holding the canonical
    * schema) reads the same files with the same null-fill semantics. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = tempDir("graft_evolve")
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("2000-01-01"))
    li.filter($"l_orderkey" % 2 === 0)
      .select($"l_orderkey", $"l_quantity")
      .write.mode("overwrite").parquet(s"$root/gen=old")
    li.filter($"l_orderkey" % 2 === 1)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .write.mode("overwrite").parquet(s"$root/gen=new")
    spark.read.option("mergeSchema", "true").parquet(root)
      .groupBy($"gen")
      .agg(count(lit(1)).as("n"),
        sum(floor($"l_quantity" * 100.0 + 0.5).cast("long")).as("qty_cents"),
        count($"l_extendedprice").as("n_priced"),
        sum(floor($"l_extendedprice" * 100.0 + 0.5).cast("long")).as("price_cents"))
      .select($"gen", $"n",
        ($"qty_cents".cast("double") / 100.0).as("total_qty"), $"n_priced",
        (coalesce($"price_cents", lit(0L)).cast("double") / 100.0).as("total_price"))
      .orderBy($"gen")
  }

  val schemaEvolutionSql: String =
    """SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'old' ELSE 'new' END AS gen,
      |  count(*) AS n,
      |  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_qty,
      |  CAST(sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_priced,
      |  CAST(coalesce(sum(CASE WHEN l_orderkey % 2 = 1
      |    THEN CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) END), 0) AS DOUBLE) / 100.0 AS total_price
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2000-01-01'
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- r37
  /** Export/display normalization — the reference's sheet-upload edge
    * (daily_function.py:1608-1630 `upload_to_google_sheet`: ±inf → None,
    * NaN/NaT → '', Timestamps → isoformat, everything handed to the
    * Sheets API as strings). Generic over the input schema: every column
    * becomes a string under the declared rules — null / NaN / ±inf →
    * empty string; dates ISO; doubles land on the engine's 4-decimal
    * half-up grid and render at FIXED scale via DECIMAL(38,4) (shortest-
    * roundtrip double printing differs between engines, fixed-scale
    * decimal rendering does not); finite magnitudes the long-backed grid
    * cannot hold (|x| ≥ Long.MaxValue/10⁴ ≈ 9.22e14) render as '' like
    * ±inf; integrals and strings verbatim.
    * Row-local projection, no shuffle — the same class as t12. */
  val ExportGridMaxAbs: Double = Long.MaxValue / 10000.0

  def exportFormat(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      val out = f.dataType match {
        case DoubleType | FloatType =>
          // GridMaxAbs: Spark's floor returns LONG, so a |x| at or above
          // Long.MaxValue/1e4 SATURATES the grid arithmetic and would
          // render a plausible-but-wrong fixed number
          // ("922337203685477.6000") instead of failing — a magnitude
          // that cannot land on the 4-decimal grid renders as '' like
          // ±inf (abs(∞) trips the same guard). The coalesce backstops
          // the never-null contract should the decimal cast ever null.
          when(c.isNull || isnan(c) || abs(c) >= ExportGridMaxAbs, lit(""))
            .otherwise(coalesce((floor(c * 10000.0 + 0.5) / 10000.0)
              .cast(DecimalType(38, 4)).cast("string"), lit("")))
        case _ => coalesce(c.cast("string"), lit(""))
      }
      out.as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** r37 driver entry: the r09 recommendations frame (the table the
    * reference uploads) through [[exportFormat]], with an as-of date
    * column (ISO rule) and deterministic NaN/∞/null probe columns so the
    * special-value rules are exercised on every run (t12's non-vacuous-
    * gate convention — the corpus itself is finite-valued). */
  def exportFormatQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val asOf = broadcast(Tables.events(spark, dir)
      .agg(max(to_date($"ts")).as("as_of_d")))
    val base = CciPipeline.recommendations(spark, dir)
      .crossJoin(asOf)
      .withColumn("probe_quality",
        when($"user_id" % 3 === 0, lit(null).cast("double"))
          .when($"user_id" % 3 === 1, lit(Double.PositiveInfinity))
          .otherwise(lit(Double.NaN)))
      .withColumn("probe_note",
        when($"user_id" % 2 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("u"), $"user_id")))
    exportFormat(base).orderBy($"user_id".cast("long"))
  }

  val exportFormatSql: String = {
    def dbl(c: String) =
      s"""CASE WHEN $c IS NULL OR isnan($c) OR isinf($c)
         |       OR abs($c) >= ${Extras.ExportGridMaxAbs} THEN ''
         |     ELSE CAST(CAST(floor($c * 10000.0 + 0.5) / 10000.0 AS DECIMAL(38,4)) AS VARCHAR) END AS $c""".stripMargin
    def str(c: String) = s"coalesce(CAST($c AS VARCHAR), '') AS $c"
    CciPipeline.recommendationsCtes + "\n" +
      s"""SELECT ${str("user_id")}, ${dbl("buy_price")},
         |  ${dbl("current_open_cci")}, ${dbl("yesterday_open_cci")},
         |  ${str("condition_holding_days")}, ${dbl("condition_target_return")},
         |  ${dbl("condition_buy_cci_threshold")}, ${dbl("condition_stop_loss_cci_threshold")},
         |  ${dbl("win_rate")}, ${str("count_win")}, ${dbl("revenue_rate")},
         |  ${dbl("avg_revenue_per_days_held")}, ${dbl("avg_days_held")},
         |  ${str("has_buy_signal")},
         |  coalesce(CAST((SELECT max(CAST(ts AS DATE)) FROM events_us) AS VARCHAR), '') AS as_of_d,
         |  -- the engine materializes REAL null/∞/NaN doubles here; the
         |  -- oracle pins the normalized rendering — a leak of "Infinity"
         |  -- or "NaN" through exportFormat breaks the hash
         |  '' AS probe_quality,
         |  CASE WHEN user_id % 2 = 0 THEN '' ELSE 'u' || CAST(user_id AS VARCHAR) END AS probe_note
         |FROM reco
         |ORDER BY CAST(user_id AS BIGINT)""".stripMargin
  }
}
