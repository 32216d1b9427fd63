package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    val salts = 8
    // 90% of the left rows pile on key 0 — the hot-key shape that stalls
    // one reducer at scale.
    val left = spark.range(0, 20000)
      .select($"id", when($"id" % 10 === 0, $"id" % 37).otherwise(lit(0L)).as("k"))
    val right = (0L until 37L).map(k => (k, s"dim_$k")).toDF("rk", "payload")
    val plain = left.join(right, left("k") === right("rk"))
      .select($"id", $"k", $"payload")
    val salted = Skew.saltedJoin(left, right, "k", "rk", salts)
      .select($"id", $"k", $"payload")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("the hot key's rows spread across all salt partitions") {
    import spark.implicits._
    val salts = 8
    val left = spark.range(0, 20000)
      .select($"id", when($"id" % 10 === 0, $"id" % 37).otherwise(lit(0L)).as("k"))
    // same deterministic salt the join applies: hash of the row's columns
    val saltOf = pmod(hash(left.columns.map(col).toSeq: _*), lit(salts))
    val spread = left.filter($"k" === 0).select(saltOf.as("salt"))
      .distinct().count()
    assert(spread == salts, s"hot key only reached $spread of $salts salts")
  }
}
