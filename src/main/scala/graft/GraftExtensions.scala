package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.catalyst.{AbsDevSumF64, ArraySumF64, DotF64, MinHashSigs, NormalizeText, PolyHash, SimHash32}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions so `spark.sql("... graft_poly_hash(x)
  * ...")` works anywhere (including pure-SQL clients over a shared
  * session). Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — GraftSession does the latter.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      exprs => PolyHash(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotF64].getName, "graft_dot"),
      exprs => DotF64(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
      exprs => SimHash32(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash_sigs"),
      exprs => MinHashSigs(exprs.head,
        exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction((
      new FunctionIdentifier("graft_normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normalize_text"),
      exprs => NormalizeText(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("graft_array_sum"),
      new ExpressionInfo(classOf[ArraySumF64].getName, "graft_array_sum"),
      exprs => ArraySumF64(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("graft_abs_dev_sum"),
      new ExpressionInfo(classOf[AbsDevSumF64].getName, "graft_abs_dev_sum"),
      exprs => AbsDevSumF64(exprs.head, exprs(1))))
  }
}
