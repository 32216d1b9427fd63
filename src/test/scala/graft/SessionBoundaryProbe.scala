package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the session_window adjacency boundary the v11b oracle SQL encodes:
  * two events EXACTLY `gap` apart merge (their [ts, ts+gap) windows are
  * adjacent and Spark merges adjacency), one microsecond past splits. The
  * oracle's lag-cumsum uses `gap_us > SessionGapUs` as the split rule —
  * this spec is what makes that `>` (not `>=`) load-bearing. */
class SessionBoundaryProbe extends AnyFunSuite {
  import TestSpark._
  import TestSpark.spark.implicits._

  test("v11 boundary: exact-gap adjacency merges, one microsecond past splits") {
    val df = Seq(
        (1L, "2024-01-01 00:00:00", 1.0),        // exactly 30 min apart
        (1L, "2024-01-01 00:30:00", 1.0),
        (2L, "2024-01-01 00:00:00", 1.0),        // 30 min + 1 us apart
        (2L, "2024-01-01 00:30:00.000001", 1.0))
      .toDF("user_id", "t", "value")
      .withColumn("ts", to_timestamp($"t"))
    val got = streaming.EventStream.sessionWindowAgg(df)
      .orderBy($"user_id", $"session_start_us")
      .select($"user_id", $"n_events", $"session_close_us" - $"session_start_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 2L, 60L * 60 * 1000000),              // one merged session, close = last + gap
      (2L, 1L, 30L * 60 * 1000000),
      (2L, 1L, 30L * 60 * 1000000)))
  }
}
