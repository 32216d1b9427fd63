package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfNative
import graft.plans.{AsOf, AsOfJoinExec}
import graft.sources.Tables

/** The native as-of join ([[graft.plans.AsOfJoinExec]]): semantics vs an
  * independent composed formulation and vs hand-computed fixtures
  * (backward/forward/tolerance/nulls), the physical plan it promises (the
  * operator itself, co-partitioned children, bounded exchange count), and
  * the plain-session planning path the driver's Verify/Bench sessions
  * exercise. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._
  import TestSpark.spark.implicits._

  // (key, ts, payload) fixtures; ts as plain longs (micros)
  private def lDf(rows: (Long, Long, String)*): DataFrame =
    rows.toSeq.toDF("k", "ts", "lp").repartition(3)
  private def rDf(rows: (Long, Long, String)*): DataFrame =
    rows.toSeq.toDF("rk", "rts", "rp").repartition(2)

  private def run(l: DataFrame, r: DataFrame, tol: Option[Long] = None,
      forward: Boolean = false): Map[(Long, Long), Option[String]] =
    AsOf.join(l, r, Seq("k" -> "rk"), "ts", "rts", tol, forward)
      .collect().map(row => (row.getLong(0), row.getLong(1)) ->
        Option(row.getString(5))).toMap

  test("backward: latest right <= left, inclusive, per key, left outer") {
    val l = lDf((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 7L, "d"), (3L, 9L, "e"))
    val r = rDf((1L, 8L, "r8"), (1L, 15L, "r15"), (1L, 20L, "r20"), (2L, 9L, "r9"))
    assert(run(l, r) == Map(
      (1L, 10L) -> Some("r8"), (1L, 20L) -> Some("r20"), (1L, 5L) -> None,
      (2L, 7L) -> None, (3L, 9L) -> None))
  }

  test("forward: earliest right >= left, inclusive") {
    val l = lDf((1L, 10L, "a"), (1L, 16L, "b"), (2L, 30L, "c"))
    val r = rDf((1L, 8L, "r8"), (1L, 15L, "r15"), (1L, 20L, "r20"), (2L, 9L, "r9"))
    assert(run(l, r, forward = true) == Map(
      (1L, 10L) -> Some("r15"), (1L, 16L) -> Some("r20"), (2L, 30L) -> None))
  }

  test("tolerance bounds the reach in both directions") {
    val l = lDf((1L, 100L, "a"), (1L, 200L, "b"))
    val r = rDf((1L, 90L, "r90"), (1L, 185L, "r185"))
    assert(run(l, r, tol = Some(10L)) ==
      Map((1L, 100L) -> Some("r90"), (1L, 200L) -> None))
    assert(run(l, r, tol = Some(15L), forward = false) ==
      Map((1L, 100L) -> Some("r90"), (1L, 200L) -> Some("r185")))
    val lf = lDf((1L, 80L, "a"))
    assert(run(lf, r, tol = Some(5L), forward = true) == Map((1L, 80L) -> None))
    assert(run(lf, r, tol = Some(10L), forward = true) ==
      Map((1L, 80L) -> Some("r90")))
  }

  test("null keys and null times never match, on either side") {
    val l = Seq((Option(1L), Option(10L), "a"), (None: Option[Long], Option(10L), "b"),
        (Option(1L), None: Option[Long], "c"))
      .toDF("k", "ts", "lp").repartition(2)
    val r = Seq((Option(1L), Option(8L), "r8"), (None: Option[Long], Option(1L), "rnull"),
        (Option(1L), None: Option[Long], "rnullts"))
      .toDF("rk", "rts", "rp").repartition(2)
    val out = AsOf.join(l, r, Seq("k" -> "rk"), "ts", "rts")
      .collect().map(row => row.getString(2) -> Option(row.getString(5))).toMap
    assert(out == Map("a" -> Some("r8"), "b" -> None, "c" -> None))
  }

  test("empty sides: empty right -> all-null matches; empty left -> empty") {
    val l = lDf((1L, 10L, "a"))
    val rEmpty = rDf().filter(lit(false))
    assert(run(l, rEmpty) == Map((1L, 10L) -> None))
    val lEmpty = lDf().filter(lit(false))
    assert(run(lEmpty, rDf((1L, 1L, "x"))).isEmpty)
  }

  test("q47 equals the independent composed formulation (window + join-back)") {
    // Independent derivation of the same semantics WITHOUT the operator:
    // q22's running-max window recovers the matched ts, then an equi-join
    // on (user_id, ts) recovers the payload — the two-pass plan the native
    // operator replaces.
    val ev = Tables.events(spark, sf)
    val views = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts")
      .agg(max(struct($"event_id", $"value")).as("m"))
      .select($"user_id".as("v_user_id"), $"ts".as("view_ts"),
        $"m.event_id".as("view_id"), $"m.value".as("view_value"))
    // is_view DESC within equal ts: a view at exactly the purchase ts must
    // fall inside the ROWS frame (the native semantics are inclusive)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"is_view".desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val purchases = ev.filter($"event_type" === "purchase")
    val viewTimes = views.select($"v_user_id".as("user_id"), $"view_ts".as("ts"))
      .withColumn("is_view", lit(true))
    val composed = purchases
      .select($"user_id", $"event_id".as("purchase_id"), $"ts", $"value".as("purchase_value"))
      .withColumn("is_view", lit(false))
      .unionByName(viewTimes.withColumn("purchase_id", lit(null).cast("long"))
        .withColumn("purchase_value", lit(null).cast("double")))
      .withColumn("last_view_ts", max(when($"is_view", $"ts")).over(w))
      .filter(!$"is_view")
      .join(views, $"user_id" === $"v_user_id" && $"last_view_ts" === $"view_ts", "left")
      .select($"user_id", $"purchase_id", $"ts".as("purchase_ts"), $"purchase_value",
        $"view_id", $"view_ts", $"view_value",
        (unix_micros($"ts") - unix_micros($"view_ts")).as("view_to_purchase_us"))
    val native = AsOfNative.q47AsofNative(spark, sf)
    val cols = native.columns.map(col).toSeq
    assert(native.exceptAll(composed.select(cols: _*)).isEmpty &&
      composed.select(cols: _*).exceptAll(native).isEmpty)
    assert(native.count() > 0)
  }

  // AQE materializes subtrees into QueryStageExec LEAVES — a plain
  // TreeNode collect stops at the stage boundary, so descend explicitly
  private def countAsOf(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
    case a: AdaptiveSparkPlanExec => countAsOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => countAsOf(q.plan)
    case other =>
      (other match { case _: AsOfJoinExec => 1; case _ => 0 }) +
        other.children.map(countAsOf).sum
  }

  test("plan: AsOfJoinExec present, children co-partitioned, bounded exchanges") {
    val df = AsOfNative.q47AsofNative(spark, sf)
    df.collect() // finalize AQE
    assert(countAsOf(df.queryExecution.executedPlan) == 1,
      df.queryExecution.executedPlan.toString)
    // static plan exchange budget: left hash(user_id) + right dedup agg
    // hash(user_id, ts) + right redistribute hash(user_id) + output sort
    val initial = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val nShuffles = initial.collect { case _: ShuffleExchangeLike => 1 }.sum
    assert(nShuffles <= 4, s"as-of plan grew a new exchange:\n$initial")
  }

  test("a plain session (no extensions) plans the node via self-registration") {
    val plain = spark.newSession()
    assert(!plain.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
    // AsOf.join registers the strategy itself — the Verify/Bench path
    val out = AsOfNative.q47AsofNative(plain, sf)
    assert(out.count() > 0)
    assert(plain.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
    // and re-joining doesn't duplicate the strategy
    AsOfNative.q47AsofNative(plain, sf)
    assert(plain.experimental.extraStrategies
      .count(_ == graft.plans.AsOfJoinStrategy) == 1)
  }

  test("API rejects missing columns, type mismatches, non-time time columns") {
    val l = lDf((1L, 1L, "a"))
    val r = rDf((1L, 1L, "b"))
    intercept[IllegalArgumentException] { AsOf.join(l, r, Seq("nope" -> "rk"), "ts", "rts") }
    intercept[IllegalArgumentException] { AsOf.join(l, r, Seq("k" -> "rp"), "ts", "rts") }
    intercept[IllegalArgumentException] { AsOf.join(l, r, Seq("k" -> "rk"), "lp", "rts") }
  }
}
