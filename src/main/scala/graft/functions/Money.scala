package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The exact-integer money discipline (SURVEY.md §6), in ONE place: prices
  * become integer cents with round-half-up, revenue becomes integer
  * ten-thousandths of a dollar (cents × discount-hundredths), so BIGINT
  * sums cannot diverge between engines regardless of reduction order. The
  * SQL twin of each expression lives inline in the oracle strings
  * (`CAST(floor(x*100+0.5) AS BIGINT)`), token-for-token. */
object Money {
  /** price → exact integer cents (round-half-up, matching the oracle). */
  def cents(c: Column): Column = floor(c * 100 + 0.5).cast("long")

  /** lineitem revenue in exact integer ten-thousandths of a dollar. */
  def tenK(price: Column, disc: Column): Column =
    cents(price) * (lit(100L) - cents(disc))
}
