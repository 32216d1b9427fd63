package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PlanGuard #2 — the scan-pushdown invariant. A filter that lifts above
  * the parquet scan, or a projection that stops pruning the read schema,
  * turns a selective 100-TB query into a full-table read without changing
  * one output row — invisible to the oracle gate, fatal at scale. This
  * spec pins, for the scan-pruning queries, that (a) the data filters
  * appear in the scan's `PushedFilters`, (b) partition filters appear in
  * `PartitionFilters` (r16/r19 additionally `require` one-partition scans
  * inline at construction), and (c) `ReadSchema` stays narrower than the
  * table. A control test proves the detector is sensitive: a filter on a
  * computed column must NOT register as pushed. */
class PushdownGuardSpec extends AnyFunSuite {
  import TestSpark._

  private def formatted(df: DataFrame): String = {
    // uncached plan: cache substitution from an earlier suite would remove
    // the very scan blocks these tests match on
    df.sparkSession.catalog.clearCache()
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  /** The formatted-plan block of the scan whose Location matches `loc`
    * (Location line through its ReadSchema line). */
  private def scanBlock(txt: String, loc: String): String =
    ("(?s)Location: [^\\n]*" + loc + "[^\\n]*\\n.*?ReadSchema: [^\\n]*").r
      .findFirstIn(txt)
      .getOrElse(fail(s"no parquet scan matching '$loc' in plan:\n$txt"))

  /** Top-level field count of the block's `ReadSchema: struct<...>`. */
  private def readCols(block: String): Int = {
    val schema = block.linesIterator
      .find(_.trim.startsWith("ReadSchema:")).get
      .dropWhile(_ != '<').drop(1).dropRight(1)
    if (schema.isEmpty) 0
    else {
      var depth = 0; var n = 1
      schema.foreach {
        case '<' => depth += 1
        case '>' => depth -= 1
        case ',' if depth == 0 => n += 1
        case _ => ()
      }
      n
    }
  }

  private def pushedFilters(block: String): String =
    block.linesIterator.find(_.trim.startsWith("PushedFilters:")).getOrElse("")

  test("q02: both scan filters push down and the read schema is pruned") {
    val txt = formatted(SparkEntry.queries("q02_filter_project")(spark, sf))
    val b = scanBlock(txt, "lineitem.parquet")
    val pf = pushedFilters(b)
    assert(pf.contains("GreaterThanOrEqual(l_shipdate"), pf)
    assert(pf.contains("GreaterThan(l_discount"), pf)
    // 4 projected + the 2 filter columns; the 10+ others never leave parquet
    assert(readCols(b) == 5, b)
    assert(readCols(b) < sources.Tables.lineitem(spark, sf).columns.length)
  }

  test("q03: each of the three joined tables prunes at its own scan") {
    val txt = formatted(SparkEntry.queries("q03_shipping_priority")(spark, sf))
    assert(pushedFilters(scanBlock(txt, "customer.parquet"))
      .contains("EqualTo(c_mktsegment,BUILDING)"))
    assert(pushedFilters(scanBlock(txt, "orders.parquet"))
      .contains("LessThan(o_orderdate"))
    assert(pushedFilters(scanBlock(txt, "lineitem.parquet"))
      .contains("GreaterThan(l_shipdate"))
  }

  test("q06: the four-predicate filter reaches the scan; only 4 columns are read") {
    val txt = formatted(SparkEntry.queries("q06_forecast_revenue")(spark, sf))
    val b = scanBlock(txt, "lineitem.parquet")
    val pf = pushedFilters(b)
    for (frag <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
        "LessThan(l_quantity"))
      assert(pf.contains(frag), s"missing $frag in $pf")
    assert(readCols(b) == 4, b)
  }

  test("q34: the conjunctive envelope of the disjunction pushes to both scans") {
    val txt = formatted(SparkEntry.queries("q34_disjunctive")(spark, sf))
    val li = pushedFilters(scanBlock(txt, "lineitem.parquet"))
    assert(li.contains("GreaterThanOrEqual(l_quantity"), li)
    assert(li.contains("LessThanOrEqual(l_quantity"), li)
    val p = pushedFilters(scanBlock(txt, "part.parquet"))
    assert(p.contains("LessThanOrEqual(p_size"), p)
    assert(p.contains("In(p_brand"), p)
    assert(readCols(scanBlock(txt, "lineitem.parquet")) <
      sources.Tables.lineitem(spark, sf).columns.length)
  }

  test("r16: the sink read-back prunes to the filtered partition at the scan") {
    // partitionedSink also REQUIREs PartitionFilters inline at construction
    val txt = formatted(SparkEntry.queries("r16_partitioned_sink")(spark, sf))
    val b = scanBlock(txt, "graft_part")
    assert(b.contains("PartitionFilters:") && b.contains("purchase"), b)
    // the partition column lives in directory names, not in the file bytes
    assert(!b.linesIterator.find(_.trim.startsWith("ReadSchema:")).get
      .contains("event_type"), b)
  }

  test("r19: the latest-snapshot read prunes to one partition at the scan") {
    // latestSnapshot REQUIREs selectedPartitions.partitionCount == 1 inline;
    // this pins the filter's placement in the final plan too
    val txt = formatted(SparkEntry.queries("r19_latest_snapshot")(spark, sf))
    val b = scanBlock(txt, "graft_snap")
    assert(b.contains("PartitionFilters:") && b.contains("snap_d"), b)
  }

  test("q18: the quantity predicate pushes below the typed boundary; 3 columns read") {
    // The round-8 plan had `.as[Lineitem].filter(lambda)` — an opaque typed
    // filter that forced a full-width deserialize of every lineitem row.
    // This pins the fixed shape: Column filter + projection BEFORE the
    // typed boundary, so the scan carries the pushed predicate and reads
    // only the three live columns.
    val txt = formatted(SparkEntry.queries("q18_typed_agg")(spark, sf))
    val b = scanBlock(txt, "lineitem.parquet")
    assert(pushedFilters(b).contains("GreaterThan(l_quantity"), b)
    assert(readCols(b) == 3, b)
  }

  test("r48: the chart date window pushes to the events scan (native-ts encodings)") {
    // The range filter is the operator's whole scale story (only the
    // requested window is read). ts pushability depends on the parquet
    // encoding: timestamp[us]/ntz scan natively and MUST push; an
    // int64-nanos encoding reads ts as a derived column (timestamp_micros
    // over the long), where file-level pruning would come from the
    // date-partitioned production layout (r16) instead — assert read-
    // schema pruning only.
    val nativeTs = spark.read.parquet(s"$sf/events.parquet")
      .schema("ts").dataType == org.apache.spark.sql.types.TimestampType
    val txt = formatted(SparkEntry.queries("r48_item_chart")(spark, sf))
    val b = scanBlock(txt, "events.parquet")
    if (nativeTs) {
      val pf = pushedFilters(b)
      assert(pf.contains("GreaterThanOrEqual(ts") && pf.contains("LessThan(ts"),
        s"chart window lost from PushedFilters: $pf")
    }
    // the fold reads only (ts, event_id, user_id, value)
    assert(readCols(b) == 4, b)
  }

  test("control: a filter on a computed column must NOT register as pushed") {
    import TestSpark.spark.implicits._
    val df = sources.Tables.lineitem(spark, sf)
      .withColumn("x", $"l_quantity" + 1.0)
      .filter($"x" > 5.0)
      .select($"l_orderkey")
    val pf = pushedFilters(scanBlock(formatted(df), "lineitem.parquet"))
    assert(!pf.contains("l_quantity,"), s"computed-column filter cannot push: $pf")
    assert(!pf.contains("GreaterThan(x"), pf)
  }
}
