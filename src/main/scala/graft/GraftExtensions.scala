package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.catalyst.{AbsDevSumF64, ArraySumF64, DotF64, MinHashSigs, NormalizeText, PolyHash, SimHash32, TopKByOrdering, TopKByScore}

/** The one registry of graft's native SQL functions: (identifier, info,
  * builder) triples consumed by BOTH registration paths —
  * session-construction injection ([[GraftExtensions]]) and post-hoc
  * runtime registration into an already-built session
  * ([[SqlSurface.ensureFunctions]], for harnesses like the driver's
  * Verify that build a plain `SparkSession` without extensions).
  */
object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (new FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)),
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotF64].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotF64(exprs.head, exprs(1))),
    (new FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
      (exprs: Seq[Expression]) => SimHash32(exprs.head)),
    (new FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash_sigs"),
      (exprs: Seq[Expression]) => MinHashSigs(exprs.head,
        exprs(1).eval().asInstanceOf[Int])),
    (new FunctionIdentifier("graft_normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normalize_text"),
      (exprs: Seq[Expression]) => NormalizeText(exprs.head)),
    (new FunctionIdentifier("graft_array_sum"),
      new ExpressionInfo(classOf[ArraySumF64].getName, "graft_array_sum"),
      (exprs: Seq[Expression]) => ArraySumF64(exprs.head)),
    (new FunctionIdentifier("graft_abs_dev_sum"),
      new ExpressionInfo(classOf[AbsDevSumF64].getName, "graft_abs_dev_sum"),
      (exprs: Seq[Expression]) => AbsDevSumF64(exprs.head, exprs(1))),
    (new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk"),
      // raw AggregateFunction: the analyzer wraps it in AggregateExpression
      // (wrapping here would defeat DISTINCT/FILTER resolution)
      (exprs: Seq[Expression]) => TopKByScore(exprs.head, exprs(1),
        foldableInt(exprs(2), "graft_topk", "k"))),
    (new FunctionIdentifier("graft_topk_ord"),
      new ExpressionInfo(classOf[TopKByOrdering].getName, "graft_topk_ord"),
      (exprs: Seq[Expression]) => TopKByOrdering(exprs.head, exprs(1),
        foldableInt(exprs(2), "graft_topk_ord", "k"))))

  /** Evaluate a foldable integral argument with a CLEAR analysis error:
    * a BIGINT literal (`CAST(5 AS BIGINT)`) must work, a non-foldable
    * expression must say so instead of failing with an opaque
    * unbound-attribute eval error deep in the analyzer. */
  private def foldableInt(e: Expression, fn: String, arg: String): Int = {
    if (!e.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "USER_RAISED_EXCEPTION",
        messageParameters = Map("errorMessage" ->
          s"$fn: argument '$arg' must be a foldable integer literal, got ${e.sql}"))
    e.eval() match {
      case i: Int => i
      case l: Long =>
        if (l < Int.MinValue || l > Int.MaxValue)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "USER_RAISED_EXCEPTION",
            messageParameters = Map("errorMessage" -> s"$fn: '$arg' out of Int range: $l"))
        l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "USER_RAISED_EXCEPTION",
          messageParameters = Map("errorMessage" ->
            (s"$fn: argument '$arg' must be an integer literal, got " +
              s"${if (other == null) "NULL" else other.getClass.getSimpleName} (${e.sql})")))
    }
  }
}

/** Optimizer rule for graft's native expressions: [[graft.functions.catalyst.NormalizeText]]
  * is IDEMPOTENT (its output is already lowercase, class-filtered, and
  * space-collapsed, so a second pass is the identity — the property
  * PropertySpec asserts data-wise), and canonicalize-then-canonicalize
  * chains arise naturally when operators compose (a d10-normalized frame
  * fed to t04's fingerprint normalizes again). Each elision removes a
  * full per-row string rebuild from the hot path. The same class of
  * simplification Catalyst ships for its own expressions (e.g.
  * `Lower(Lower(x))` via the likely-idempotent rules) — extended here to
  * an engine-native function Catalyst can't know about. */
object SimplifyGraftExpressions
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import graft.functions.catalyst.NormalizeText
  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case NormalizeText(inner @ NormalizeText(_)) => inner
    }
}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions so `spark.sql("... graft_poly_hash(x)
  * ...")` works anywhere (including pure-SQL clients over a shared
  * session), plus the [[SimplifyGraftExpressions]] optimizer rule.
  * Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — GraftSession does the latter.
  * [[SqlSurface.ensureFunctions]] covers sessions built without
  * extensions (`spark.experimental.extraOptimizations` for the rule).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => SimplifyGraftExpressions)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
