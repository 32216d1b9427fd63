package graft

import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-recovery contract of the v10 staged upsert commit
  * (streaming.UpsertStream): a crash or rename failure inside the
  * per-bucket swap window must never lose snapshot rows — the merged
  * bucket survives in staging and a retried micro-batch completes the
  * swap BEFORE it reads the snapshot (the round-5 design preserved the
  * copy but the retry destroyed it by deleting staging first).
  */
class UpsertRecoverySpec extends AnyFunSuite {
  import TestSpark._
  import TestSpark.spark.implicits._
  import streaming.UpsertStream

  private def bars(rows: Seq[(Long, String, Long, Double)]): DataFrame =
    rows.toDF("series_id", "d", "version", "close")
      .select($"series_id", to_date($"d").as("bar_date"), $"version", $"close")

  private def snapshot(targetDir: String): Set[(Long, Long, Double)] =
    spark.read.parquet(targetDir)
      .select($"series_id", $"version", $"close")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def fsFor(dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Stage a merged frame exactly the way mergeBatch does (partitionBy
    * bucket → _SUCCESS marker at the staging root). */
  private def writeStaging(merged: DataFrame, staging: Path): Unit =
    merged
      .withColumn("bucket", pmod($"series_id", lit(UpsertStream.NumBuckets.toLong)))
      .write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)

  // series 1 and 9 share bucket 1 (9 % 8): series 9 exists ONLY in the old
  // snapshot, so losing bucket 1's old rows is observable as a missing 9.
  private val w1 = Seq((1L, "2024-01-01", 1L, 10.0), (9L, "2024-01-02", 1L, 90.0),
    (2L, "2024-01-01", 1L, 20.0))
  private val w2 = Seq((1L, "2024-01-01", 2L, 11.5))
  private val expectedAfterBoth = Set((1L, 2L, 11.5), (9L, 1L, 90.0), (2L, 1L, 20.0))

  test("v10 recovery: retried merge completes a swap that crashed between delete and rename") {
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_crash").toString
    val targetDir = s"$base/target"
    UpsertStream.mergeBatch(bars(w1), targetDir)
    val (fs, targetPath) = fsFor(targetDir)
    val staging = new Path(targetDir + ".staging")
    // Manufacture the mid-swap crash state of a w2 merge: staging holds the
    // fully-written merged output (keep-last of old bucket rows ∪ delta),
    // and bucket 1's target dir is already deleted but not yet replaced.
    writeStaging(UpsertStream.keepLast(bars(w1 ++ w2)), staging)
    assert(fs.exists(new Path(staging, "_SUCCESS")))
    assert(fs.delete(new Path(targetPath, "bucket=1"), true))
    // The retried micro-batch: without entry recovery it would read the
    // snapshot with series 9 already gone and silently lose it.
    UpsertStream.mergeBatch(bars(w2), targetDir)
    assert(snapshot(targetDir) == expectedAfterBoth)
    assert(!fs.exists(staging))
  }

  test("v10 recovery: an uncommitted staging write (no _SUCCESS) is dropped, not restored") {
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_partial").toString
    val targetDir = s"$base/target"
    UpsertStream.mergeBatch(bars(w1), targetDir)
    val (fs, targetPath) = fsFor(targetDir)
    val staging = new Path(targetDir + ".staging")
    // Crash DURING the staging write: a partial bucket dir with garbage,
    // no _SUCCESS. The swap never started, so every target bucket is
    // intact; recovery must drop staging wholesale and never rename
    // partial data over a live bucket.
    fs.mkdirs(new Path(staging, "bucket=5"))
    UpsertStream.mergeBatch(bars(w2), targetDir)
    assert(snapshot(targetDir) == expectedAfterBoth)
    assert(!fs.exists(staging))
    assert(!fs.exists(new Path(targetPath, "bucket=5")))
  }

  test("v10 recovery: rename failure raises, preserves staging, and recovery completes the merge") {
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_rename").toString
    val targetDir = s"$base/target"
    UpsertStream.mergeBatch(bars(w1), targetDir)
    val (fs, targetPath) = fsFor(targetDir)
    val staging = new Path(targetDir + ".staging")
    writeStaging(UpsertStream.keepLast(bars(w1 ++ w2)), staging)
    // HDFS-style failure: rename reports false instead of throwing. The
    // swap must raise (not silently drop staging) after having deleted
    // dst — the exact window the entry recovery exists for.
    val failingFs = new FilterFileSystem(fs) {
      override def rename(src: Path, dst: Path): Boolean = false
    }
    val ex = intercept[java.io.IOException] {
      UpsertStream.swapBuckets(failingFs, staging, targetPath, Seq(1L))
    }
    assert(ex.getMessage.contains("preserved in staging"))
    assert(fs.exists(new Path(staging, "bucket=1")))
    assert(!fs.exists(new Path(targetPath, "bucket=1")))
    // The retried batch (or a bare recovery call) completes the swap.
    UpsertStream.completePendingSwap(fs, staging, targetPath)
    assert(snapshot(targetDir) == expectedAfterBoth)
    assert(!fs.exists(staging))
  }
}
