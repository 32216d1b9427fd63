package graft

import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-safety contract of the v10 manifest-atomic upsert commit
  * (streaming.UpsertStream): the single manifest rename IS the commit, so
  * a crash ANYWHERE in the multi-bucket publish leaves readers on the old
  * snapshot for EVERY bucket — never bucket A new / bucket B old — and
  * the retried micro-batch converges to the single-run result (keep-last
  * is idempotent).
  */
class UpsertRecoverySpec extends AnyFunSuite {
  import TestSpark._
  import TestSpark.spark.implicits._
  import streaming.UpsertStream

  private def bars(rows: Seq[(Long, String, Long, Double)]): DataFrame =
    rows.toDF("series_id", "d", "version", "close")
      .select($"series_id", to_date($"d").as("bar_date"), $"version", $"close")

  private def snapshot(targetDir: String): Set[(Long, Long, Double)] =
    UpsertStream.readSnapshot(spark, targetDir)
      .select($"series_id", $"version", $"close")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def fsFor(dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  // series 1 (bucket 1) and 2 (bucket 2): w2 touches BOTH buckets, so a
  // mid-commit crash between their publishes is observable if atomicity
  // breaks; series 9 shares bucket 1 (9 % 8) and exists only in the old
  // snapshot, so losing old bucket-1 rows is observable as a missing 9.
  private val w1 = Seq((1L, "2024-01-01", 1L, 10.0), (9L, "2024-01-02", 1L, 90.0),
    (2L, "2024-01-01", 1L, 20.0))
  private val w2 = Seq((1L, "2024-01-01", 2L, 11.5), (2L, "2024-01-02", 2L, 22.0))
  private val afterW1 = Set((1L, 1L, 10.0), (9L, 1L, 90.0), (2L, 1L, 20.0))
  private val expectedAfterBoth = Set((1L, 2L, 11.5), (9L, 1L, 90.0),
    (2L, 1L, 20.0), (2L, 2L, 22.0))

  /** Manufacture the crash state "killed between two bucket publishes":
    * scratch written, SOME touched buckets moved to generation dirs, no
    * manifest commit. Returns the partially-published map. */
  private def crashMidPublish(targetDir: String, publishOnly: Seq[Long]): Unit = {
    val (fs, target) = fsFor(targetDir)
    val Some((version, bucketMap)) = UpsertStream.latestManifest(fs, target)
    val next = version + 1
    val touched = Seq(1L, 2L)
    val existingDirs = touched.flatMap(bucketMap.get).map(d => s"$targetDir/$d")
    val merged = UpsertStream.keepLast(
        spark.read.parquet(existingDirs: _*).unionByName(bars(w2)))
      .withColumn("bucket", pmod($"series_id", lit(UpsertStream.NumBuckets.toLong)))
    val scratch = new Path(target, s".delta_v$next")
    merged.write.mode("overwrite").partitionBy("bucket").parquet(scratch.toString)
    // the kill: only a subset of the touched buckets get published, and
    // the manifest for v(next) is never written
    UpsertStream.publishGenerations(fs, scratch, target, publishOnly, next)
  }

  test("v10 atomicity: a kill between two bucket publishes leaves readers old-everywhere") {
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_midkill").toString
    val targetDir = s"$base/target"
    UpsertStream.mergeBatch(bars(w1), targetDir)
    crashMidPublish(targetDir, publishOnly = Seq(1L)) // bucket 2 never moves
    // bucket 1's NEW generation dir exists on disk, but the reader resolves
    // the old manifest: old values everywhere — including bucket 1
    assert(snapshot(targetDir) == afterW1)
    // the retried micro-batch commits the whole delta and converges to the
    // single-run result; the orphaned generation dir is swept
    UpsertStream.mergeBatch(bars(w2), targetDir)
    assert(snapshot(targetDir) == expectedAfterBoth)
    val (fs, target) = fsFor(targetDir)
    val leftovers = fs.listStatus(target).map(_.getPath.getName)
      .filter(n => n.startsWith(".delta_v") || n.endsWith(".tmp"))
    assert(leftovers.isEmpty)
  }

  test("v10 atomicity: a kill after ALL publishes but before the manifest rename still reads old") {
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_premanifest").toString
    val targetDir = s"$base/target"
    UpsertStream.mergeBatch(bars(w1), targetDir)
    crashMidPublish(targetDir, publishOnly = Seq(1L, 2L)) // both moved, no commit
    assert(snapshot(targetDir) == afterW1)
    UpsertStream.mergeBatch(bars(w2), targetDir)
    assert(snapshot(targetDir) == expectedAfterBoth)
  }

  test("v10 commit: a failed manifest rename raises and leaves the old snapshot intact") {
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_rename").toString
    val targetDir = s"$base/target"
    UpsertStream.mergeBatch(bars(w1), targetDir)
    val (fs, target) = fsFor(targetDir)
    // HDFS-style failure: rename reports false instead of throwing. The
    // commit must raise — a silent false would let the GC collect the new
    // generation dirs AND leave callers believing the batch landed.
    val failingFs = new FilterFileSystem(fs) {
      override def rename(src: Path, dst: Path): Boolean = false
    }
    val ex = intercept[java.io.IOException] {
      UpsertStream.commitManifest(failingFs, target, 2L, Map(1L -> "b1_v2"))
    }
    assert(ex.getMessage.contains("snapshot unchanged"))
    assert(snapshot(targetDir) == afterW1)
  }

  test("v10 GC: post-commit sweep keeps only the latest manifest and its generation dirs") {
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_gc").toString
    val targetDir = s"$base/target"
    UpsertStream.mergeBatch(bars(w1), targetDir)
    UpsertStream.mergeBatch(bars(w2), targetDir)
    val (fs, target) = fsFor(targetDir)
    val names = fs.listStatus(target).map(_.getPath.getName).toSet
    val Some((v, live)) = UpsertStream.latestManifest(fs, target)
    assert(v == 2L)
    assert(names.count(_.startsWith("_manifest_v")) == 1)
    assert(names.filter(_.startsWith("b")) == live.values.toSet)
    assert(snapshot(targetDir) == expectedAfterBoth)
  }

  test("v10 idempotence: re-merging the same delta after a committed batch changes nothing") {
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_retry").toString
    val targetDir = s"$base/target"
    UpsertStream.mergeBatch(bars(w1), targetDir)
    UpsertStream.mergeBatch(bars(w2), targetDir)
    val before = snapshot(targetDir)
    // Structured Streaming may RETRY a batch whose commit already landed
    // (crash after manifest rename, before checkpoint advance): keep-last
    // re-applied is a no-op on values, only the version counter moves.
    UpsertStream.mergeBatch(bars(w2), targetDir)
    assert(snapshot(targetDir) == before)
  }
}
