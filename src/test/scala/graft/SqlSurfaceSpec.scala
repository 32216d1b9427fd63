package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL surface (SqlSurface): parity of the sql01-sql03 SQL-string
  * queries with their Scala twins, and the post-hoc function-registration
  * path used by extension-less sessions (the driver's Verify). */
class SqlSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("sql01: pure-SQL pricing summary equals the q01 DataFrame program") {
    assert(rows(SqlSurface.pricingSummaryViaSql(spark, sf)) ==
      rows(operators.Relational.q01PricingSummary(spark, sf)))
  }

  test("sql02: pure-SQL fingerprint equals the t04 DataFrame program") {
    assert(rows(SqlSurface.fingerprintViaSql(spark, sf)) ==
      rows(operators.TextAnalysis.fingerprint(spark, sf)))
  }

  test("sql03: the graft_cci operator view serves exactly the r04 output") {
    assert(rows(SqlSurface.cciViaView(spark, sf)) ==
      rows(operators.CciPipeline.cciQuery(spark, sf)))
  }

  test("sql05: pure SQL over graft_asof plans the NATIVE AsOfJoinExec and equals q47") {
    val df = SqlSurface.asofViaSql(spark, sf)
    def countAsOf(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        countAsOf(a.executedPlan)
      case other =>
        (other match { case _: graft.plans.AsOfJoinExec => 1; case _ => 0 }) +
          other.children.map(countAsOf).sum
    }
    assert(countAsOf(df.queryExecution.executedPlan) > 0,
      "sql05 fell back to a non-native plan — the SQL client lost AsOfJoinExec:\n" +
        df.queryExecution.executedPlan.toString)
    assert(rows(df) == rows(operators.AsOfNative.q47AsofNative(spark, sf)))
  }

  test("sql06-sql08: the interval views serve the operators' plans — equi bin joins, no nested loop") {
    val c = SqlSurface.intervalConcurrencyViaSql(spark, sf)
    assert(rows(c) == rows(operators.Intervals.intervalConcurrency(spark, sf)))
    val rj = SqlSurface.rangeJoinViaSql(spark, sf)
    val ij = SqlSurface.intervalJoinViaSql(spark, sf)
    Seq("sql07" -> rj, "sql08" -> ij).foreach { case (n, df) =>
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"),
        s"$n lost the bin-join plan to a nested loop:\n" + phys.take(1500))
      // the (bin, salt) EQUI join survives the view; at sf0.001 the tiny
      // probe side may legitimately broadcast — the guarded property is
      // equi-keyed, never per-probe-row scans (ShuffleGuardSpec pins the
      // exact exchange budget on the operator itself at sf0.01)
      assert(phys.contains("SortMergeJoin") || phys.contains("ShuffledHashJoin")
          || phys.contains("BroadcastHashJoin"),
        s"$n must plan the (bin, salt) equi join:\n" + phys.take(1500))
    }
    assert(rows(rj) == rows(operators.Intervals.rangeJoin(spark, sf)))
    assert(rows(ij) == rows(operators.Intervals.intervalJoin(spark, sf)))
  }

  test("sql09: a pure-SQL WHERE clause prunes the zone-mapped listing via ZoneMapFileIndex") {
    val df = SqlSurface.zorderViaSql(spark, sf)
    assert(rows(df) == rows(operators.ZoneMap.zorderSkip(spark, sf)))
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.relation.location.isInstanceOf[graft.plans.ZoneMapFileIndex])
    val total = scan.relation.location.inputFiles.length
    val listed = scan.relation.location
      .listFiles(Nil, scan.dataFilters).flatMap(_.files).size
    assert(listed > 0 && listed < total,
      s"SQL-pushed filters listed $listed of $total files — no pruning")
  }

  test("sql11: a pure-SQL TIMESTAMP band prunes the ts-zoned events listing (LONG zones)") {
    // VERDICT r14 task 4: zones were double-only, so timestamp columns
    // could not register for skipping. The ts-clustered events layout
    // stores its zones as LONG MICROS; the chart window's own WHERE —
    // written in SQL, no operator plumbing — must drop files at planning
    // time, and the answers must stay bit-identical to the oracle-gated
    // r48 chart (the layout is a clustered rewrite of the same rows).
    val df = SqlSurface.tsChartViaZonemap(spark, sf)
    assert(rows(df) == rows(operators.CciPipeline.itemChartQuery(spark, sf)))
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.relation.location.isInstanceOf[graft.plans.ZoneMapFileIndex])
    val total = scan.relation.location.inputFiles.length
    assert(total == operators.ZoneMap.TsFiles)
    val listed = scan.relation.location
      .listFiles(Nil, scan.dataFilters).flatMap(_.files).size
    assert(listed > 0 && listed < total,
      s"timestamp band listed $listed of $total files — no LONG-zone pruning")
    // the window covers one week of a ~3-month span clustered over 16
    // files: the skip must be substantial, not boundary-accidental
    assert(listed <= total / 2,
      s"timestamp band listed $listed of $total files — skip ratio too weak")
  }

  test("ensureFunctions registers graft functions into a PLAIN session (Verify's path)") {
    // Build a genuinely extension-less session over the same SparkContext:
    // clear the session singletons so getOrCreate cannot hand back the
    // extension-carrying TestSpark session, then restore them for the
    // suites that follow in this JVM.
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val plain = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
      assert(plain ne shared)
      // Without registration the function must not resolve...
      intercept[AnalysisException] {
        plain.sql("SELECT graft_poly_hash('abc')").collect()
      }
      // ...and after ensureFunctions it computes the native expression.
      SqlSurface.ensureFunctions(plain)
      assert(plain.sql("SELECT graft_poly_hash('abc') AS h").head().getLong(0) ==
        functions.catalyst.PolyHashExpr.hash(UTF8String.fromString("abc")))
      // The full SQL-surface query runs end to end on the plain session.
      assert(SqlSurface.fingerprintViaSql(plain, sf).count() > 0)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
