package graft.functions.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for graft's hot paths (SURVEY.md §4).
  *
  * The interpreted higher-order-function formulations (aggregate/transform
  * lambdas) are kept as the reference semantics — these expressions compute
  * the identical values inside whole-stage codegen via a static helper
  * call, which benchmarking at sf0.1 showed to be the dominant cost of the
  * dedup/similarity operators (per-char regexp extraction and per-pair
  * lambda folds are evaluated interpretively).
  */
object PolyHashExpr {
  val P: Long = 1000000007L

  /** fold(acc=0; acc = (acc*31 + codepoint) mod P) over the string's
    * UTF-16 chars — equals the HOF/regexp formulation (and the DuckDB
    * oracle's ascii() fold) for all BMP text. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      acc = (acc * 31L + str.charAt(i).toLong) % P
      i += 1
    }
    acc
  }
}

case class PolyHash(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    PolyHashExpr.hash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.catalyst.PolyHashExpr.hash($c)")
  override protected def withNewChildInternal(c: Expression): PolyHash = copy(child = c)
}

object DotF64Expr {
  /** Ascending-index dot product — same order as the zip_with/aggregate
    * fold and the oracle's list_reduce. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    DotF64Expr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.catalyst.DotF64Expr.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF64 =
    copy(left = l, right = r)
}

object SimHash32Expr {
  /** 32-bit SimHash over an array of 64-bit feature hashes: bit j is set
    * iff the signed count of j-bits across features is positive. Equals the
    * relational formulation (explode × 32, sum ±1, power-of-two recompose)
    * the DuckDB oracle uses, in one pass. */
  def simhash(xs: ArrayData): Long = {
    val n = xs.numElements()
    val w = new Array[Int](32)
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var j = 0
      while (j < 32) {
        if (((x >> j) & 1L) == 1L) w(j) += 1 else w(j) -= 1
        j += 1
      }
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < 32) {
      if (w(j) > 0) acc |= (1L << j)
      j += 1
    }
    acc
  }
}

case class SimHash32(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHash32Expr.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.catalyst.SimHash32Expr.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash32 = copy(child = c)
}

object MinHashSigsExpr {
  val P: Long = PolyHashExpr.P
  def a(i: Int): Long = 2L * i + 3L
  def b(i: Int): Long = 97L + 31L * i

  /** K minhash signatures over an array of feature hashes:
    * sig_i = min over x of (a_i·x + b_i) mod P. Single pass; equals the
    * K-column min-aggregate formulation the DuckDB oracle uses. */
  def sigs(xs: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = xs.numElements()
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var j = 0
      while (j < k) {
        val h = (x * a(j) + b(j)) % P
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class MinHashSigs(child: Expression, k: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    MinHashSigsExpr.sigs(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.catalyst.MinHashSigsExpr.sigs($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSigs = copy(child = c)
}

object NormalizeTextExpr {
  /** graft's canonical whitespace class: the INTERSECTION of Java's `\s`
    * ([ \t\n\x0B\f\r]) and RE2/DuckDB's `\s` ([ \t\n\f\r]) — the five
    * chars both engines agree on. Vertical tab (U+000B) is Java-only
    * whitespace, so it is treated like any other non-class char
    * (stripped), keeping the normalizer's output equal to the RE2 oracle
    * on ALL inputs rather than only VT-free ones. NBSP etc. are not
    * whitespace on either engine and get stripped, gluing words. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** One-pass equivalent of d10's canonicalizer
    * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9\s]", ""), "\s+", " "))`
    * — lowercase, drop non-[a-z0-9\s], collapse whitespace runs, trim —
    * without materializing the three intermediate strings or running two
    * interpreted regex passes over every byte (the round-4 bench's top
    * non-ML cost). Equals the RE2/DuckDB-oracle composition for all BMP
    * text (see [[isWs]] for the U+000B portability note), and is
    * LOCALE-INDEPENDENT by design: per-char toLowerCase never consults
    * the JVM default locale, matching DuckDB's lower() — whereas a
    * String.toLowerCase-based path would map I→ı under tr_TR and change
    * hashes per deployment locale. (İ's expansion i+U+0307 converges:
    * the combining mark is class-stripped on both paths.) */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = Character.toLowerCase(str.charAt(i))
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else if (isWs(c)) {
        pendingSpace = true
      } // anything else: stripped (also erases a lone İ-expansion mark)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class NormalizeText(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    NormalizeTextExpr.normalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.catalyst.NormalizeTextExpr.normalize($c)")
  override protected def withNewChildInternal(c: Expression): NormalizeText = copy(child = c)
}

object ArrayFoldExpr {
  /** Left-fold sum with 0.0 init in index order — equals
    * `aggregate(arr, 0.0, (a,x) -> a+x)` and the oracle's
    * `list_reduce(list_prepend(0.0, l), (a,b) -> a+b)`. */
  def sum(xs: ArrayData): Double = {
    val n = xs.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += xs.getDouble(i); i += 1 }
    acc
  }

  /** Sum of |x − m| in index order — equals
    * `aggregate(transform(arr, x -> abs(x - m)), 0.0, (a,x) -> a+x)`
    * without materializing the transformed array. */
  def absDevSum(xs: ArrayData, m: Double): Double = {
    val n = xs.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += math.abs(xs.getDouble(i) - m); i += 1 }
    acc
  }
}

case class ArraySumF64(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    ArrayFoldExpr.sum(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.catalyst.ArrayFoldExpr.sum($c)")
  override protected def withNewChildInternal(c: Expression): ArraySumF64 = copy(child = c)
}

case class AbsDevSumF64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, m: Any): Any =
    ArrayFoldExpr.absDevSum(a.asInstanceOf[ArrayData], m.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, m) => s"graft.functions.catalyst.ArrayFoldExpr.absDevSum($a, $m)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AbsDevSumF64 =
    copy(left = l, right = r)
}

object LshBucketsExpr {
  /** Random-hyperplane LSH bucket ids for `tables` tables × `planes`
    * planes in ONE pass over the vector (round-15, the MinHashSigs
    * precedent applied to s02: the zip_with/transform spelling is
    * tables×planes interpreted array traversals PER ROW — measured the
    * dominant cost of the sf10 bucketing). Plane component for global
    * plane g = t·planes + p at dimension c is
    * `((g·73856093 + c·19349663) % 1000003) % 2 == 1 ? -1.0 : 1.0` and
    * the dot accumulates ascending from 0.0 — bit-identical constants,
    * fold order and sign test to the HOF form and the DuckDB twin
    * ([[graft.similarity.Similarity.lshTopKSqlFor]]), so the s02 oracle
    * is unchanged. */
  def buckets(v: ArrayData, planes: Int, tables: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < planes) {
        val g = (t * planes + p).toLong
        var acc = 0.0
        var c = 0
        while (c < n) {
          val m = ((g * 73856093L + c * 19349663L) % 1000003L) % 2L
          acc += v.getDouble(c) * (if (m == 1L) -1.0 else 1.0)
          c += 1
        }
        // NaN mirrors Catalyst's double ordering (ADVICE round-15): the
        // HOF spelling's `>= 0` comparison runs Spark's total order where
        // NaN sorts ABOVE every value, so a NaN dot must set the bit here
        // too — Java's `NaN >= 0.0` alone is false and a NaN-containing
        // embedding would bucket differently between the two spellings
        if (acc >= 0.0 || java.lang.Double.isNaN(acc)) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class LshBuckets(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    LshBucketsExpr.buckets(v.asInstanceOf[ArrayData], planes, tables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.catalyst.LshBucketsExpr.buckets($c, $planes, $tables)")
  override protected def withNewChildInternal(c: Expression): LshBuckets = copy(child = c)
}

object GraftColumns {
  import org.apache.spark.sql.GraftShim

  def poly_hash(c: Column): Column = GraftShim.column(PolyHash(GraftShim.expression(c)))
  def dot_f64(a: Column, b: Column): Column =
    GraftShim.column(DotF64(GraftShim.expression(a), GraftShim.expression(b)))
  def simhash32(c: Column): Column = GraftShim.column(SimHash32(GraftShim.expression(c)))
  def minhash_sigs(c: Column, k: Int): Column =
    GraftShim.column(MinHashSigs(GraftShim.expression(c), k))
  def normalize_text(c: Column): Column =
    GraftShim.column(NormalizeText(GraftShim.expression(c)))
  def array_sum_f64(c: Column): Column =
    GraftShim.column(ArraySumF64(GraftShim.expression(c)))
  def abs_dev_sum_f64(arr: Column, mean: Column): Column =
    GraftShim.column(AbsDevSumF64(GraftShim.expression(arr), GraftShim.expression(mean)))
  def lsh_buckets(v: Column, planes: Int, tables: Int): Column =
    GraftShim.column(LshBuckets(GraftShim.expression(v), planes, tables))
  def topk_by(score: Column, id: Column, k: Int): Column =
    GraftShim.column(TopKByScore(GraftShim.expression(score),
      GraftShim.expression(id), k).toAggregateExpression())
  /** Generic top-k: k smallest `ord` values (any orderable type; struct
    * keys give multi-column orders, negate a component for DESC),
    * payloads returned rank-ordered. */
  def topk_by_ord(ord: Column, payload: Column, k: Int): Column =
    GraftShim.column(TopKByOrdering(GraftShim.expression(ord),
      GraftShim.expression(payload), k).toAggregateExpression())
}
