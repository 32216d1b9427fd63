package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CciPipeline
import graft.sources.{LocalFileEventConnector, Tables}

/** The connector seam's resume invariant: rows already "saved" (before the
  * watermark) plus rows the connector fetches must partition the corpus —
  * no gap, no overlap. This is the property a real broker transport has to
  * preserve and the one the r31 oracle can't state directly (it only sees
  * the fetched side). */
class ConnectorSpec extends AnyFunSuite {
  import TestSpark._
  import TestSpark.spark.implicits._

  test("r31: saved + fetched partitions the events corpus exactly") {
    val wm = CciPipeline.fetchWatermark(spark, sf)
    val requests = wm.filter($"fetch_needed")
      .select($"user_id", $"fetch_start", $"fetch_end")
    val fetched = new LocalFileEventConnector(sf).fetch(spark, requests)
      .select($"event_id")
    val ev = Tables.events(spark, sf).withColumn("d", to_date($"ts"))
    // saved side: every (user, day) at or before that user's watermark
    val saved = ev.join(wm.select($"user_id", $"saved_max_date"), Seq("user_id"))
      .filter($"saved_max_date".isNotNull && $"d" <= $"saved_max_date")
      .select($"event_id")
    val total = ev.count()
    assert(fetched.count() + saved.count() == total, "gap or overlap at the watermark")
    assert(fetched.intersect(saved).count() == 0, "fetched a row already saved")
    assert(fetched.union(saved).distinct().count() == total)
  }

  test("r31: fetch honors the request batch — keys and date bounds") {
    val requests = Seq((7L, "2024-01-10", "2024-01-15"))
      .toDF("user_id", "fs", "fe")
      .select($"user_id", $"fs".cast("date").as("fetch_start"),
        $"fe".cast("date").as("fetch_end"))
    val got = new LocalFileEventConnector(sf).fetch(spark, requests)
    assert(got.filter($"user_id" =!= 7L).count() == 0)
    assert(got.filter($"d" < "2024-01-10" || $"d" > "2024-01-15").count() == 0)
    // and the range actually selects a strict subset, not everything
    val all = Tables.events(spark, sf).filter($"user_id" === 7L).count()
    assert(got.count() > 0 && got.count() < all)
  }
}
