package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.catalyst.{GraftColumns, NormalizeText}

/** The injected optimizer rule ([[SimplifyGraftExpressions]]):
  * normalize∘normalize collapses to one pass in the OPTIMIZED plan — on
  * the extensions-built session and on a plain session patched post hoc —
  * and the collapse is semantics-preserving (the idempotence PropertySpec
  * asserts data-wise, here pinned plan-wise). */
class ExtensionRuleSpec extends AnyFunSuite {
  import TestSpark._
  import TestSpark.spark.implicits._

  private def normalizeCount(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.transformAllExpressions {
      case e: NormalizeText => n += 1; e
    }
    n
  }

  test("normalize∘normalize collapses to one pass on the extensions session") {
    // non-foldable input: a literal frame would CONSTANT-FOLD the whole
    // chain away (also correct, but then there is nothing to count)
    val docs = spark.range(2).select($"id",
      concat(lit("  Mixed   CASE\t"), $"id".cast("string"), lit("!! ")).as("text"))
    val twice = docs.select(
      GraftColumns.normalize_text(GraftColumns.normalize_text($"text")).as("t"))
    assert(normalizeCount(twice) == 1, twice.queryExecution.optimizedPlan.toString)
    val once = docs.select(GraftColumns.normalize_text($"text").as("t"))
    assert(twice.collect().toSeq == once.collect().toSeq)
  }

  test("triple-nested normalize still collapses to one pass") {
    val docs = spark.range(1).select(concat(lit(" X  y "), $"id".cast("string")).as("text"))
    val thrice = docs.select(GraftColumns.normalize_text(
      GraftColumns.normalize_text(GraftColumns.normalize_text($"text"))).as("t"))
    assert(normalizeCount(thrice) == 1)
    assert(thrice.head().getString(0) == "x y 0")
  }

  test("a plain session patched via ensureFunctions gets the rule too") {
    // newSession(): same context, FRESH session state (no extensions-era
    // registry or experimental list) — the driver's-Verify-session shape
    val plain = spark.newSession()
    import plain.implicits._
    val before = plain.range(1).select(GraftColumns.normalize_text(
      GraftColumns.normalize_text(concat(lit("A  "), $"id"))).as("t"))
    SqlSurface.ensureFunctions(plain)
    val after = plain.range(1).select(GraftColumns.normalize_text(
      GraftColumns.normalize_text(concat(lit("A  "), $"id"))).as("t"))
    assert(normalizeCount(after) == 1, "post-hoc rule registration missed")
    assert(after.head().getString(0) == "a 0")
    // and registering twice must not duplicate the rule
    SqlSurface.ensureFunctions(plain)
    assert(plain.experimental.extraOptimizations
      .count(_ == SimplifyGraftExpressions) == 1)
    before.collect(): Unit // the pre-patch frame still executes fine
  }

  test("SQL-spelled nesting collapses as well") {
    SqlSurface.ensureFunctions(spark)
    spark.range(1).select(concat(lit("  A   b "), $"id".cast("string")).as("text"))
      .createOrReplaceTempView("ext_probe")
    val df = spark.sql(
      "SELECT graft_normalize_text(graft_normalize_text(text)) AS t FROM ext_probe")
    assert(normalizeCount(df) == 1)
    assert(df.head().getString(0) == "a b 0")
  }
}
