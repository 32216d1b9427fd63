package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** v10: streaming keep-last upsert sink — the real-time counterpart of the
  * batch r03 merge (graft.operators.CciPipeline.upsertKeepLast). The
  * reference re-fetches a window of recent history every run and overlays
  * it onto its saved CSV snapshot keeping the newest row per (series, day)
  * (daily_function.py get_history / save-merge path); here the late/updated
  * bars arrive as a STREAM and each micro-batch merges into a partitioned
  * parquet snapshot via foreachBatch — Structured Streaming's MERGE idiom.
  *
  * Scale shape: the snapshot is hash-partitioned on `bucket` =
  * pmod(series_id, NumBuckets); a micro-batch touches only the buckets its
  * keys hash into, the merge reads ONLY those partitions back (partition
  * pruning on the bucket filter), and only touched buckets are rewritten —
  * per-batch cost is proportional to the delta's bucket footprint, not
  * snapshot size. The commit is staging-write + per-bucket atomic rename
  * (never an overwrite of its own input), so a crash leaves each bucket
  * either fully-old or fully-new; a transactional table format would add
  * cross-bucket atomicity, but the PLAN — prune → keep-last per key →
  * swap touched buckets — is the same.
  */
object UpsertStream {
  val NumBuckets = 8

  val barSchema: StructType = StructType(Seq(
    StructField("series_id", LongType), StructField("bar_date", DateType),
    StructField("version", LongType), StructField("close", DoubleType)))

  def readBarStream(spark: SparkSession, streamDir: String): DataFrame =
    spark.readStream.schema(barSchema).parquet(streamDir)

  /** Keep the newest version per (series_id, bar_date) via one max_by hash
    * aggregation (r03's formulation — no window, partial-aggregable). */
  def keepLast(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.groupBy($"series_id", $"bar_date")
      .agg(max_by(struct($"version", $"close"),
        $"version").as("b"))
      .select($"series_id", $"bar_date", $"b.version".as("version"),
        $"b.close".as("close"))
  }

  /** Merge one micro-batch into the snapshot at `targetDir`. Public so the
    * spec can drive it deterministically; the streaming query below wires
    * it into foreachBatch. */
  def mergeBatch(batch: DataFrame, targetDir: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val withBucket = batch.withColumn("bucket", pmod($"series_id", lit(NumBuckets)))
    val touched = withBucket.select($"bucket").distinct()
      .collect().map(_.getLong(0))          // ≤ NumBuckets values — driver-safe
    if (touched.isEmpty) return
    // Snapshot existence via the Hadoop FileSystem API — java.io.File
    // answers false for every non-local filesystem, which would silently
    // replace touched buckets with the bare delta (data loss on HDFS/S3).
    val targetPath = new org.apache.hadoop.fs.Path(targetDir)
    val fs = targetPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(targetDir + ".staging")
    // MUST run before reading `existing`: a crash in a prior run's swap
    // window left the only copy of a bucket in staging — restore it into
    // the target first, or the retried merge reads the snapshot without
    // that bucket's old rows and silently loses them.
    completePendingSwap(fs, staging, targetPath)
    val existing =
      if (fs.exists(targetPath))
        spark.read.parquet(targetDir).filter($"bucket".isin(touched: _*))
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        barSchema.add("bucket", LongType))
    val merged = keepLast(existing.unionByName(withBucket)
        .select($"series_id", $"bar_date", $"version", $"close"))
      .withColumn("bucket", pmod($"series_id", lit(NumBuckets)))
    // Crash-safe merge: write the merged buckets to a STAGING path (reads
    // the live snapshot, writes elsewhere — no self-referential overwrite,
    // so no task retry or recompute can ever read a file mid-delete), then
    // swap each touched bucket in with an atomic per-directory rename.
    // Each bucket lands old-complete or new-complete, never mixed; if a
    // swap fails or the process dies between the delete and the rename,
    // that bucket's new copy SURVIVES in staging (staging is only cleaned
    // after every swap succeeded) so recovery is a re-run of the swap.
    // Cross-bucket atomicity is what a transactional table format would
    // add. HDFS-style FileSystems report rename failure by RETURNING
    // false, not throwing — checked explicitly, or a failed swap would
    // pass silently and the staging cleanup would discard the only copy.
    merged.write.mode("overwrite").partitionBy("bucket")
      .parquet(staging.toString)
    swapBuckets(fs, staging, targetPath, touched)
  }

  /** The per-bucket swap: atomic directory renames from a fully-written
    * staging into the target, staging dropped only after EVERY swap
    * succeeded. Factored out so the crash-recovery spec can drive it with
    * a rename-failing FilterFileSystem. */
  private[graft] def swapBuckets(fs: org.apache.hadoop.fs.FileSystem,
      staging: org.apache.hadoop.fs.Path, targetPath: org.apache.hadoop.fs.Path,
      touched: Seq[Long]): Unit = {
    touched.foreach { k =>
      val src = new org.apache.hadoop.fs.Path(staging, s"bucket=$k")
      val dst = new org.apache.hadoop.fs.Path(targetPath, s"bucket=$k")
      if (fs.exists(src)) {
        fs.mkdirs(targetPath)
        if (!fs.delete(dst, true) && fs.exists(dst))
          throw new java.io.IOException(s"upsert: cannot clear $dst for swap")
        if (!fs.rename(src, dst))
          throw new java.io.IOException(
            s"upsert: rename $src -> $dst failed; merged bucket preserved in staging")
      }
    }
    fs.delete(staging, true)
  }

  /** Finish a PRIOR merge's interrupted swap. A crash between delete(dst)
    * and rename(src,dst) leaves the only copy of that bucket in staging;
    * Structured Streaming then RETRIES the micro-batch, and a retry that
    * opened by deleting staging would destroy that sole copy — the retried
    * merge would read `existing` with the bucket's old rows already gone
    * from the target, silently losing the old snapshot rows. Recovery is
    * gated on staging's _SUCCESS marker: absent means the staging write
    * itself never committed, so the swap never started, every target
    * bucket is intact, and staging (possibly partial) is safe to drop.
    * Present means staging buckets are complete — any with a MISSING
    * target dir are exactly the ones caught mid-swap; rename them in,
    * then drop staging. Idempotent: re-running after a crash inside
    * recovery itself just resumes. */
  private[graft] def completePendingSwap(fs: org.apache.hadoop.fs.FileSystem,
      staging: org.apache.hadoop.fs.Path,
      targetPath: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(staging)) return
    if (fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))) {
      fs.listStatus(staging)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
        .foreach { s =>
          val dst = new org.apache.hadoop.fs.Path(targetPath, s.getPath.getName)
          if (!fs.exists(dst)) {
            fs.mkdirs(targetPath)
            if (!fs.rename(s.getPath, dst))
              throw new java.io.IOException(
                s"upsert recovery: rename ${s.getPath} -> $dst failed")
          }
        }
    }
    fs.delete(staging, true)
  }

  def upsertQuery(spark: SparkSession, streamDir: String, targetDir: String,
      checkpointDir: String): StreamingQuery =
    readBarStream(spark, streamDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => mergeBatch(batch, targetDir) }
      .start()
}
