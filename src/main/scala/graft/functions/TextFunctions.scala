package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the dedup / text-analysis
  * operators (SURVEY.md §2 C-rows).
  *
  * Everything here is built from codegen'd `functions._` + higher-order
  * functions (no UDFs), and every primitive has an exact DuckDB SQL twin in
  * [[TextSql]] — same fold order, same arithmetic — so oracle comparison is
  * bit-identical.
  */
object TextFunctions {
  /** Large prime modulus for polynomial string hashing: fits 31·P + 127 well
    * inside Int64. */
  val HashP: Long = 1000000007L

  def tokens(c: Column): Column = split(c, " ")

  /** Word 3-gram shingles (distinct) from a PRE-PROJECTED tokens column.
    *
    * `tk` must be a bound attribute (e.g. `split(text).as("tk")` projected
    * in a previous select), NOT an inline `split(...)` expression: Spark
    * does no common-subexpression elimination inside higher-order-function
    * lambdas, so an inline split would re-tokenize the document for every
    * element_at — profiling showed ~300 re-splits per doc. */
  def shingles3(tk: Column): Column =
    when(size(tk) >= 3,
      array_distinct(transform(sequence(lit(1), size(tk) - 2), i =>
        concat_ws(" ", element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2)))))
      .otherwise(array().cast("array<string>"))

  /** Word 5-gram spans WITH multiplicity (no array_distinct) from a
    * PRE-PROJECTED tokens column — the span-dedup (d11) unit: long enough
    * that random text rarely collides, so a cross-document duplicate span
    * is real shared content (Gopher's duplicated-n-gram gate uses the same
    * idea). Distinctness is NOT applied: each token position contributes
    * one span, so per-doc span counts are position counts. */
  def spans5(tk: Column): Column =
    when(size(tk) >= 5,
      transform(sequence(lit(1), size(tk) - 4), i =>
        concat_ws(" ", element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2),
          element_at(tk, i + 3), element_at(tk, i + 4))))
      .otherwise(array().cast("array<string>"))

  /** Deterministic polynomial hash over the characters of a string:
    * fold(acc = 0; acc = (acc·31 + code) mod P). Matches
    * [[TextSql.polyHash]] exactly (same traversal order, same mod).
    * Implemented as a native codegen Expression ([[catalyst.PolyHash]]) —
    * the equivalent regexp_extract_all + aggregate HOF formulation
    * evaluates interpretively and dominated dedup time at sf0.1. */
  def polyHash(c: Column): Column = catalyst.GraftColumns.poly_hash(c)

  /** Sum fold with explicit 0.0 init — the DuckDB twin is
    * list_reduce(list_prepend(0.0, l), (a,b) -> a+b). */
  def foldSum(c: Column): Column = aggregate(c, lit(0.0), (a, x) => a + x)

  /** Deterministic round-half-up-toward-+inf; see SURVEY.md §6. */
  def fr(c: Column, n: Int): Column = {
    val s = math.pow(10, n)
    floor(c * s + 0.5) / s
  }

  /** Deterministic micro-log of a rational: floor(1e6·ln(a/b) + 0.5) for
    * integer columns 1 ≤ a ≤ b < 2^62, computed WITHOUT libm ln — java
    * Math.log and C libm log are each only ulp-accurate, so their
    * last-bit disagreement can flip a floor/argmax between engines (the
    * t10 rule: no libm float in rank position). Construction: bit-length
    * normalization a/b = m·2⁻ᵏ with m ∈ [1,2) (exact integer and
    * power-of-two steps; the one rounded op is the division, correctly
    * rounded identically everywhere), then ln(m) = 2·atanh((m−1)/(m+1))
    * as a FIXED-ORDER 7-term series — every op an IEEE-determined
    * +,*,/ on identical inputs, so both engines produce bit-identical
    * longs. Truncation < 1e-8 is a consistent DEFINITION shared by both
    * sides, not an approximation hazard. [[TextSql.microLnCols]] is the
    * DuckDB twin, op for op. */
  def microLn(a: Column, b: Column): Column = {
    val s = length(bin(b)) - length(bin(a))
    // floor(pow+0.5) snaps 2^s to the exact integer even if a libm pow
    // were an ulp off; the long->double cast of a power of two is exact
    val p2 = floor(pow(lit(2.0), s) + 0.5).cast("long")
    val m0 = (a.cast("double") * p2) / b.cast("double")
    val m = when(m0 < 1.0, m0 * 2).otherwise(m0)
    val k = when(m0 < 1.0, s + 1).otherwise(s)
    val z = (m - 1) / (m + 1)
    val z2 = z * z
    val lnm = lit(2.0) * z * (lit(1.0) + z2 * (lit(1.0) / 3 + z2 * (lit(1.0) / 5 +
      z2 * (lit(1.0) / 7 + z2 * (lit(1.0) / 9 + z2 * (lit(1.0) / 11 +
      z2 * (lit(1.0) / 13)))))))
    floor((lnm - k * lit(0.6931471805599453)) * lit(1e6) + lit(0.5)).cast("long")
  }
}

/** DuckDB SQL twins of [[TextFunctions]] for oracle construction. */
object TextSql {
  val HashP: Long = TextFunctions.HashP

  /** 3-gram shingles of `string_split(text, ' ')`; empty below 3 tokens
    * (range(1, n) is empty for n <= 1). */
  def shinglesCte(table: String = "documents"): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $table),
       |shingles AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 1),
       |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS sh
       |  FROM toks)""".stripMargin

  /** 5-gram spans with multiplicity (the [[TextFunctions.spans5]] twin);
    * range(1, n) is empty for n <= 1, so docs under 5 tokens emit none. */
  def spans5Cte(table: String = "documents"): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $table),
       |spans AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(tk) - 3),
       |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4])) AS sh
       |  FROM toks)""".stripMargin

  /** RE2 '.' does not match \n — the char class does, so newline-bearing
    * documents fold identically to the native expression. */
  def polyHash(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(regexp_extract_all($expr, '[\\s\\S]'), ch -> CAST(ascii(ch) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $HashP)"

  def foldSum(expr: String): String =
    s"list_reduce(list_prepend(0.0, $expr), (a, b) -> a + b)"

  def fr(expr: String, n: Int): String = {
    val s = math.pow(10, n)
    s"floor(($expr) * $s + 0.5) / $s"
  }

  /** [[TextFunctions.microLn]]'s DuckDB twin as staged CTE columns (a
    * single expression would exponentially duplicate the subterms).
    * Produces a CTE chain `pfx0 … pfx` where `pfx` = `src`'s columns
    * plus `outCol` holding floor(1e6·ln(aExpr/bExpr)+0.5); identical
    * operation order to the Scala side, so the longs are bit-equal. */
  def microLnCtes(pfx: String, src: String, aExpr: String, bExpr: String,
      outCol: String): String =
    s"""${pfx}0 AS (SELECT *, CAST($aExpr AS BIGINT) AS mla_,
       |  CAST($bExpr AS BIGINT) AS mlb_ FROM $src),
       |${pfx}1 AS (SELECT *, length(bin(mlb_)) - length(bin(mla_)) AS mls_ FROM ${pfx}0),
       |${pfx}2 AS (SELECT *,
       |  (CAST(mla_ AS DOUBLE) * CAST(floor(power(2.0, mls_) + 0.5) AS BIGINT))
       |    / CAST(mlb_ AS DOUBLE) AS mlm0_ FROM ${pfx}1),
       |${pfx}3 AS (SELECT *,
       |  CASE WHEN mlm0_ < 1.0 THEN mlm0_ * 2 ELSE mlm0_ END AS mlm_,
       |  CASE WHEN mlm0_ < 1.0 THEN mls_ + 1 ELSE mls_ END AS mlk_ FROM ${pfx}2),
       |${pfx}4 AS (SELECT *, (mlm_ - 1) / (mlm_ + 1) AS mlz_ FROM ${pfx}3),
       |${pfx}5 AS (SELECT *, mlz_ * mlz_ AS mlz2_ FROM ${pfx}4),
       |$pfx AS (SELECT * EXCLUDE (mla_, mlb_, mls_, mlm0_, mlm_, mlk_, mlz_, mlz2_),
       |  CAST(floor((2.0 * mlz_ * (1.0 + mlz2_ * (1.0/3 + mlz2_ * (1.0/5 +
       |    mlz2_ * (1.0/7 + mlz2_ * (1.0/9 + mlz2_ * (1.0/11 + mlz2_ * (1.0/13)))))))
       |    - mlk_ * 0.6931471805599453) * 1e6 + 0.5) AS BIGINT) AS $outCol
       |  FROM ${pfx}5)""".stripMargin
}
