package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once RESUME from the Structured Streaming checkpoint for the
  * two stateful sinks (v09 keyed-state ledger, v10 foreachBatch upsert):
  * stop a running query after batch N, feed more data, restart a NEW query
  * from the SAME checkpoint, and prove the combined result equals a
  * single uninterrupted run — no fill/bar lost, none double-applied, and
  * (v09) the per-account running state carried across the restart.
  * UpsertRecoverySpec covers the sink's own commit protocol; this spec
  * covers the SOURCE/state side of the contract: the checkpoint's offset
  * log and state store survive a query object's death. */
class CheckpointRecoverySpec extends AnyFunSuite {
  import TestSpark._
  import TestSpark.spark.implicits._

  test("v09: ledger restarted from its checkpoint resumes state and equals the single run") {
    val base = java.nio.file.Files.createTempDirectory("graft_v09_ckpt").toString
    val fillDir = s"$base/fills"; val ckpt = s"$base/ckpt"
    new java.io.File(fillDir).mkdirs()
    val fills = operators.CciPipeline.orderFills(spark, sf).cache()
    // Split along the ledger sort order (event_date first): every wave-1
    // fill precedes every wave-2 fill per account, so a two-batch run and
    // a one-batch run apply fills in the same order and running values
    // are comparable run-to-run.
    val dates = fills.select($"event_date").distinct()
      .orderBy($"event_date").collect().map(_.getDate(0))
    assert(dates.length >= 2, "need at least two event dates to split")
    val cutoff = dates(dates.length / 2)
    val wave1 = fills.filter($"event_date" < lit(cutoff))
    val wave2 = fills.filter($"event_date" >= lit(cutoff))
    assert(wave1.count() > 0 && wave2.count() > 0)

    // memory sink cannot recover from a checkpoint; foreachBatch -> parquet
    // is the recoverable sink shape (same as v10's upsert)
    val outDir = s"$base/out"
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      streaming.LedgerStream.runningLedger(spark, fillDir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[streaming.LedgerStream.LedgerUpdate], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }.start()

    wave1.write.mode("append").parquet(fillDir)
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop() // "crash" after batch 1
    val part1 = spark.read.parquet(outDir).collect()

    wave2.write.mode("append").parquet(fillDir)
    val q2 = run() // NEW query object, SAME checkpoint
    try q2.processAllAvailable() finally q2.stop()
    // wave-2 rows are exactly the post-cutoff dates (the waves partition
    // on event_date, so the split is recoverable from the output itself)
    val part2 = spark.read.parquet(outDir).collect()
      .filter(!_.getDate(1).before(cutoff))

    val cols = Seq("cust_id", "event_date", "order_no", "side",
      "qty_delta", "cash_delta", "position_qty", "cash_balance")
    val combined = (part1 ++ part2).toSeq
      .map(r => cols.map(c => r.get(r.fieldIndex(c))))
    // exactly-once across the restart: wave-1 rows emitted once, wave-2
    // resumed from the offset log (not reprocessed from zero)
    assert(part1.nonEmpty && part2.nonEmpty)
    assert(combined.size == fills.count())
    // the single uninterrupted run over the same files
    val single = {
      val d2 = java.nio.file.Files.createTempDirectory("graft_v09_single").toString
      fills.write.mode("overwrite").parquet(d2)
      val q = streaming.LedgerStream.runningLedger(spark, d2)
        .writeStream.outputMode("append").format("memory")
        .queryName("v09_single").start()
      try q.processAllAvailable() finally q.stop()
      spark.table("v09_single").collect()
        .map(r => cols.map(c => r.get(r.fieldIndex(c))))
    }
    assert(combined.toSet == single.toSet)
    // running state really crossed the restart: wave-2 rows of accounts
    // seen in wave 1 start from the carried (qty, cash), not from zero
    val qtyIdx = cols.indexOf("position_qty")
    val custIdx = cols.indexOf("cust_id")
    val wave1Totals = part1.groupBy(_.getLong(0)).map { case (c, rs) =>
      c -> rs.maxBy(r => (r.getDate(1).getTime, r.getLong(2), r.getString(3)))
        .getLong(qtyIdx)
    }
    val resumed = part2.filter(r => wave1Totals.contains(r.getLong(custIdx)))
    assert(resumed.nonEmpty, "some account must span both waves")
  }

  test("v10: upsert restarted from its checkpoint converges to the batch keep-last") {
    val base = java.nio.file.Files.createTempDirectory("graft_v10_ckpt").toString
    val streamDir = s"$base/stream"; val targetDir = s"$base/target"
    val ckpt = s"$base/ckpt"
    new java.io.File(streamDir).mkdirs()
    def wave(rows: Seq[(Long, String, Long, Double)]): Unit =
      rows.toDF("series_id", "d", "version", "close")
        .select($"series_id", to_date($"d").as("bar_date"), $"version", $"close")
        .coalesce(1).write.mode("append").parquet(streamDir)
    val w1 = Seq((1L, "2024-01-01", 1L, 10.0), (9L, "2024-01-02", 1L, 90.0))
    val w2 = Seq((1L, "2024-01-01", 2L, 11.5), (2L, "2024-01-01", 1L, 20.0))
    wave(w1)
    val q1 = streaming.UpsertStream.upsertQuery(spark, streamDir, targetDir, ckpt)
    try q1.processAllAvailable() finally q1.stop() // "crash" after batch 1
    wave(w2)
    val q2 = streaming.UpsertStream.upsertQuery(spark, streamDir, targetDir, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val got = streaming.UpsertStream.readSnapshot(spark, targetDir)
      .select($"series_id", $"version", $"close").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 11.5), (9L, 1L, 90.0), (2L, 1L, 20.0)))
  }
}
