package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift contract for the events `ts` column.
  *
  * The driver has regenerated `events.parquet` with different timestamp
  * encodings across rounds (TIMESTAMP(NANOS) through round 6, timestamp[us]
  * in round 7 — the round-7 break took down 39 queries). This spec pins the
  * loader contract: `Tables.events` must normalize nanos-int64,
  * micros-timestamp, millis-timestamp, and timestamp_ntz parquet to the
  * SAME micros-timestamp frame, so a future regen changes nothing.
  */
class EventTsContractSpec extends AnyFunSuite {
  import TestSpark._
  import TestSpark.spark.implicits._

  /** One logical row: 2024-03-01 12:34:56.789123 UTC, epoch micros below. */
  private val EpochUs = 1709296496789123L

  private def writeDir(): String =
    java.nio.file.Files.createTempDirectory("graft_ts_contract").toString

  private def baseCols(ts: org.apache.spark.sql.Column): DataFrame =
    Seq((1L, 7L, "view", 1.5, "{}")).toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

  private def readBack(dir: String): (String, Long) = {
    val df = sources.Tables.events(spark, dir)
    val tsType = df.schema("ts").dataType.typeName
    assert(tsType == "timestamp", s"normalized ts must be TIMESTAMP, got $tsType")
    (tsType, df.select(unix_micros($"ts")).as[Long].head())
  }

  test("nanos-int64 parquet (pre-round-7 encoding) normalizes to micros") {
    val dir = writeDir()
    baseCols(lit(EpochUs * 1000L)).write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(readBack(dir)._2 == EpochUs)
  }

  private def withOutputTimestampType[A](t: String)(body: => A): A = {
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, t)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("timestamp[us] parquet (round-7 encoding) passes through unchanged") {
    val dir = writeDir()
    withOutputTimestampType("TIMESTAMP_MICROS") {
      baseCols(timestamp_micros(lit(EpochUs)))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    assert(readBack(dir)._2 == EpochUs)
  }

  test("timestamp[ms] parquet normalizes to micros") {
    val dir = writeDir()
    withOutputTimestampType("TIMESTAMP_MILLIS") {
      baseCols(timestamp_micros(lit(EpochUs - EpochUs % 1000)))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    assert(readBack(dir)._2 == EpochUs - EpochUs % 1000)
  }

  test("timestamp_ntz parquet reinterprets as UTC instant (sessions run UTC)") {
    val dir = writeDir()
    baseCols(timestamp_micros(lit(EpochUs)).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(readBack(dir)._2 == EpochUs)
  }

  test("streaming reader applies the same normalization (nanos fixture)") {
    val dir = writeDir()
    baseCols(lit(EpochUs * 1000L)).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val sdf = streaming.EventStream.readEventStream(spark, s"$dir/events.parquet")
    assert(sdf.schema("ts").dataType.typeName == "timestamp")
  }

  test("an unrecognized ts type fails loudly, not silently") {
    val dir = writeDir()
    baseCols(lit("not-a-timestamp")).write.mode("overwrite").parquet(s"$dir/events.parquet")
    intercept[IllegalArgumentException] { sources.Tables.events(spark, dir) }
  }
}
