package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §5).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; salting is
  * the static fallback when one build-side key dominates (e.g. a single
  * hot user_id at 100 TB). The skewed side gets a deterministic salt from
  * its OTHER columns; the replicated side explodes across all salts —
  * results are identical to the plain join, but the hot key's rows spread
  * over `salts` reducers. */
object Skew {
  /** Equi-join `left.key == right.key` where `left` has skewed keys:
    * salt left deterministically, replicate right `salts` times. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int): DataFrame = {
    val saltCol = pmod(hash(left.columns.map(col).toSeq: _*), lit(salts))
    val l = left.withColumn("__salt", saltCol)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
