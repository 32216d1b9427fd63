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

  test("zipfTrades: deterministic Zipf law — rank 1 dominates, tail thins as ~1/r") {
    import spark.implicits._
    val n = 400000L
    val t = Skew.zipfTrades(spark, n, Skew.SkewSymbols).cache()
    val counts = t.groupBy($"symbol_id").count()
      .orderBy($"symbol_id").collect()
      .map(r => r.getAs[Long]("symbol_id") -> r.getAs[Long]("count")).toMap
    // rank 1 carries ln(2)/ln(S) of the corpus (±2% absolute)
    val expectedShare = math.log(2) / math.log(Skew.SkewSymbols)
    val share = counts(1L).toDouble / n
    assert(math.abs(share - expectedShare) < 0.02,
      s"rank-1 share $share, expected ~$expectedShare")
    // Zipf decay: rank 1 ≫ rank 4 ≫ rank 16 (factor ~4 each, loose bounds)
    assert(counts(1L) > 2L * counts(4L) && counts(4L) > 2L * counts(16L))
    // deterministic: regeneration is bit-identical
    val again = Skew.zipfTrades(spark, n, Skew.SkewSymbols)
    assert(t.exceptAll(again).count() == 0 && again.exceptAll(t).count() == 0)
    t.unpersist()
  }

  test("skewedFeeTotals: salted variant equals the plain merge join on Zipf data") {
    val trades = Skew.zipfTrades(spark, 200000L, Skew.SkewSymbols)
    val stats = Skew.symbolStats(spark, Skew.SkewSymbols)
    val plain = Skew.skewedFeeTotals(trades, stats, salted = false).collect()
    val salted = Skew.skewedFeeTotals(trades, stats, salted = true).collect()
    assert(plain.length == salted.length && plain.nonEmpty)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getAs[Long]("symbol_id") == s.getAs[Long]("symbol_id"))
      assert(p.getAs[Long]("fee_total") == s.getAs[Long]("fee_total"))
      assert(p.getAs[Long]("n_trades") == s.getAs[Long]("n_trades"))
    }
  }

  test("zipfBars: Zipf series lengths, contiguous dates, chunked CCI equals window CCI") {
    import spark.implicits._
    val bars = Skew.zipfBars(spark, 20000L, 20).cache()
    val counts = bars.groupBy($"user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    assert(counts.size == 20)
    // rank-1 series dominates, ~1/r decay
    assert(counts(0L) > 2L * counts(3L))
    // per-series dates are contiguous from the epoch start (no gaps)
    val gaps = bars.groupBy($"user_id").agg(
      count(lit(1)).as("n"), min($"d").as("mn"), max($"d").as("mx"))
      .filter(datediff($"mx", $"mn") =!= $"n" - 1)
    assert(gaps.count() == 0)
    // the chunked rewrite is bit-equal to the window form on skewed series
    val cfg = operators.CciPipeline.GridConfig()
    val w = operators.CciPipeline.cciFromBars(bars, cfg)
      .select($"user_id", $"d", $"idx", $"cnt", $"close_cci", $"open_cci")
      .orderBy($"user_id", $"d").collect()
    val c = operators.CciPipeline.cciChunkedFromBars(bars, cfg, chunkRows = 100)
      .select($"user_id", $"d", $"idx", $"cnt", $"close_cci", $"open_cci")
      .orderBy($"user_id", $"d").collect()
    assert(w.length == c.length && w.nonEmpty)
    w.zip(c).foreach { case (a, b) => assert(a == b, s"\n$a\n$b") }
    bars.unpersist()
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
