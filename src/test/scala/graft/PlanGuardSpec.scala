package graft

import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LocalRelation, LogicalPlan, OneRowRelation, UnaryNode, Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide plan-regression guard for the anti-pattern class rounds
  * 4–5 eliminated: a window with NO partition spec funnels its whole
  * input through one task, which is only ever acceptable deliberately —
  * and deliberate single partitions are spelled with a constant key
  * (`pmod(k, 1)`, see Curation), which keeps the spec non-empty. So the
  * invariant is crisp: ZERO unpartitioned logical Windows across the
  * query surface.
  *
  * Guarded set = every `SparkEntry.queries` entry whose CONSTRUCTION is
  * lazy (plan-building only). Operators that execute work while being
  * built — iterative fixpoints (q43, d07 and its p03 composition),
  * MLlib fits (ml*, s04/s05, d09), filesystem round-trips (r12/r14/r16/
  * r17/r24/r27/r28/m05, p02's split sink, r19/r21-r23's workspace
  * reads, t06/t07/t09's driver-collected broadcast tables, d03/d05/d08's
  * eager checkpoints) — are audited by their own specs/PlanCheck
  * instead; re-running their actions here would double the suite's
  * runtime for no added coverage. */
class PlanGuardSpec extends AnyFunSuite {
  import TestSpark._

  private val lazyQueries: Seq[String] = Seq(
    (1 to 42).map(i => f"q$i%02d_"),          // whole relational core
    Seq("d01_", "d02_", "d04_", "d06_", "d10_", "d11_"),
    Seq("t01_", "t02_", "t03_", "t04_", "t05_", "t08_", "t10_"),
    Seq("p01_", "p04_", "p05_", "p05b_", "p06_", "p07_", "p08_"),
    Seq("m01_", "m02_", "m03_", "m04_"),
    Seq("r01_", "r02_", "r03_", "r04_", "r05_", "r06_", "r07_", "r08_",
      "r09_", "r10_", "r11_", "r13_", "r15_", "r18_", "r20_", "r25_", "r26_",
      "r29_"),
    Seq("s01_", "s02_", "s03_"),
    Seq("a01_", "v01_", "v02b_", "v11b_")
  ).flatten.flatMap(p => SparkEntry.queries.keys.find(_.startsWith(p)))

  test("plan guard: no query plans an unpartitioned window (single-task funnel)") {
    // uncached plans: an earlier suite's maybeCache would substitute
    // InMemoryRelations and hide the windows this guard inspects
    spark.catalog.clearCache()
    assert(lazyQueries.size >= 80, s"guard list shrank: ${lazyQueries.size}")
    val offenders = lazyQueries.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      val bad = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      if (bad.nonEmpty) Some(s"$name (${bad.size} unpartitioned window(s))")
      else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows found in:\n  ${offenders.mkString("\n  ")}")
  }

  /** A join side whose cardinality is bounded by CONSTRUCTION, not by
    * data: literal rows (condition grids), the 1-row relation, or a
    * global aggregate (no grouping keys ⇒ exactly one row). Unary
    * wrappers (project/filter/alias/explode-over-literals) preserve the
    * bound — every child row count is already literal-bounded. */
  private def boundedSide(p: LogicalPlan): Boolean = p match {
    case _: LocalRelation => true
    case _: OneRowRelation => true
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case u: UnaryNode => boundedSide(u.child)
    case j: Join => boundedSide(j.left) && boundedSide(j.right)
    case _ => false
  }

  /** Declared all-pairs baselines: s01 exists to be the verified
    * brute-force comparison for the bucketed ANN paths — its cross join
    * IS the operator. Nothing else may plan an unbounded cross join. */
  private val crossJoinBaselines = Set("s01_ann_bruteforce")

  test("plan guard: every cross join has a metadata-bounded side (no accidental all-pairs)") {
    var seen = 0
    val offenders = lazyQueries.filterNot(crossJoinBaselines).flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      val crosses = plan.collect {
        case j: Join if j.condition.isEmpty || j.joinType == Cross => j
      }
      seen += crosses.size
      val bad = crosses.filterNot(j => boundedSide(j.left) || boundedSide(j.right))
      if (bad.nonEmpty) Some(s"$name (${bad.size} unbounded cross join(s))")
      else None
    }
    // non-vacuity: the guarded set DOES contain deliberate bounded cross
    // joins (literal grids, 1-row scalar aggregates) — if this ever hits
    // zero the collect pattern rotted, not the engine
    assert(seen > 0, "guard went vacuous: no cross joins matched at all")
    assert(offenders.isEmpty,
      s"unbounded cross joins found in:\n  ${offenders.mkString("\n  ")}")
  }
}
