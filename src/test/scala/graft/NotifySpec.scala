package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CciPipeline, Notify}

/** r39: the daily run's notification feed as a table. The driver gate pins
  * the full feed against the DuckDB replay; this spec pins the feed's
  * internal consistency — the counts the messages EMBED must equal the rows
  * the same feed CARRIES, which the hash gate alone can't localize. */
class NotifySpec extends AnyFunSuite {
  import TestSpark._

  private lazy val feed = Notify.notifyFeed(spark, sf).collect()

  test("r39: each singleton kind appears exactly once, in emission order") {
    val singles = feed.filter(_.getAs[String]("kind") != "buy_signal")
    assert(singles.map(r => (r.getAs[Long]("seq_group"), r.getAs[String]("kind"))).toSeq ===
      Seq((1L, "candidate_count"), (3L, "buy_count"), (4L, "run_end")))
    assert(singles.forall(_.isNullAt(1)), "singleton rows carry no symbol")
  }

  test("r39: the buy-count message embeds exactly the feed's own buy rows") {
    val buys = feed.filter(_.getAs[String]("kind") == "buy_signal")
    val counted = feed.find(_.getAs[String]("kind") == "buy_count").get
      .getAs[String]("message").split(" : ").last.toLong
    assert(counted == buys.length)
    // and the candidate-count message embeds the r10 candidate set's size
    val candMsg = feed.find(_.getAs[String]("kind") == "candidate_count").get
      .getAs[String]("message").split(" : ").last.toLong
    assert(candMsg == CciPipeline.candidateFilter(spark, sf).count())
  }

  test("r39: buy messages fire exactly for candidates with a live crossover") {
    import spark.implicits._
    val expected = CciPipeline.recommendations(spark, sf)
      .filter($"has_buy_signal" === 1)
      .join(CciPipeline.candidateFilter(spark, sf).select($"user_id"), Seq("user_id"))
      .select($"user_id").as[Long].collect().sorted.toSeq
    val got = feed.filter(_.getAs[String]("kind") == "buy_signal")
      .map(_.getAs[Long]("user_id")).sorted.toSeq
    assert(got === expected)
  }

  test("r39: message text is total — no nulls, and CCIs render at fixed 1-dp scale") {
    assert(feed.forall(_.getAs[String]("message") != null))
    val OneDp = """전날 CCI: (-?\d+\.\d)\, 오늘 CCI: (-?\d+\.\d),""".r
    feed.filter(_.getAs[String]("kind") == "buy_signal").foreach { r =>
      val m = r.getAs[String]("message")
      assert(OneDp.findFirstIn(m).isDefined,
        s"buy message lacks fixed-scale 1-dp CCIs: $m")
      assert(!m.contains("null") && !m.contains("NaN"), m)
    }
  }
}
