package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * Scale shape: the snapshot is hash-bucketed on pmod(series_id,
  * NumBuckets), one immutable directory per bucket generation; a
  * micro-batch reads back ONLY the bucket dirs its keys hash into and
  * rewrites only those — per-batch cost is proportional to the delta's
  * bucket footprint, not snapshot size.
  *
  * Commit protocol — MANIFEST-ATOMIC across buckets (the shape a
  * transactional table format like Delta/Iceberg gives you, built from
  * the two primitives every Hadoop FileSystem has: immutable files and
  * atomic single-file rename):
  *
  *  1. merged buckets are written to a scratch dir, then MOVED to fresh
  *     generation dirs (`b<bucket>_v<N+1>`) that no reader references yet
  *     — old generation dirs are never touched;
  *  2. the new manifest `_manifest_v<N+1>.txt` (bucket → generation dir)
  *     is written to a tmp name and atomically RENAMED into place. That
  *     one rename IS the commit: readers resolve the highest-numbered
  *     manifest, so they see the WHOLE batch (every bucket remapped at
  *     once) or none of it — never bucket A new / bucket B old, which the
  *     per-bucket-swap design of round 5/6 could expose mid-commit;
  *  3. garbage (older manifests, unreferenced generation dirs, scratch
  *     leftovers) is collected only AFTER the commit; a crash anywhere
  *     leaves either "old manifest + some unreferenced new dirs" (invisible
  *     to readers, swept by the next batch) or "new manifest + uncollected
  *     old dirs" (correct data, swept later). Structured Streaming then
  *     retries the micro-batch from its checkpoint; re-merging the same
  *     delta onto either state is IDEMPOTENT because keep-last's max_by on
  *     `version` is — the retried commit produces identical rows.
  *
  * Single-writer is assumed (one streaming query owns the sink —
  * Structured Streaming's own execution guarantee); readers are
  * snapshot-isolated against the LATEST committed manifest, whose dirs the
  * GC of the NEXT commit may remove — the same freshness contract as
  * vacuum in table formats.
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

  private val ManifestName = "_manifest_v(\\d+)\\.txt".r
  private val GenDirName = "b(\\d+)_v(\\d+)".r

  /** Highest committed manifest: (version, bucket → generation dir name).
    * Tmp files and scratch dirs never match the pattern, so a crashed
    * commit is invisible here. */
  private[graft] def latestManifest(fs: FileSystem,
      target: Path): Option[(Long, Map[Long, String])] = {
    if (!fs.exists(target)) return None
    val versions = fs.listStatus(target).flatMap(_.getPath.getName match {
      case ManifestName(v) => Some(v.toLong)
      case _ => None
    })
    if (versions.isEmpty) return None
    val v = versions.max
    val in = fs.open(new Path(target, s"_manifest_v$v.txt"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val map = text.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(k, dir) = line.split(' ')
      k.toLong -> dir
    }.toMap
    Some((v, map))
  }

  /** The atomic commit: write the full bucket→dir map to a tmp file, then
    * one rename publishes it. HDFS-style FileSystems report rename failure
    * by RETURNING false — checked, or a failed commit would pass silently
    * and the GC below would collect the data it was supposed to publish. */
  private[graft] def commitManifest(fs: FileSystem, target: Path,
      version: Long, map: Map[Long, String]): Unit = {
    val tmp = new Path(target, s"_manifest_v$version.txt.tmp")
    val out = fs.create(tmp, true)
    try out.write(map.toSeq.sortBy(_._1)
      .map { case (k, d) => s"$k $d" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val committed = new Path(target, s"_manifest_v$version.txt")
    if (!fs.rename(tmp, committed))
      throw new java.io.IOException(
        s"upsert: manifest commit rename $tmp -> $committed failed; " +
          "snapshot unchanged, new generation dirs left for GC")
  }

  /** Read the committed snapshot: the union of the latest manifest's
    * generation dirs. Empty (schema'd) frame before the first commit.
    * The bucket column is derived — generation dirs store only the data
    * columns. */
  def readSnapshot(spark: SparkSession, targetDir: String): DataFrame = {
    import spark.implicits._
    val target = new Path(targetDir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = latestManifest(fs, target).map(_._2.values.toSeq).getOrElse(Nil)
    val base =
      if (dirs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], barSchema)
      else spark.read.schema(barSchema)
        .parquet(dirs.map(d => s"$targetDir/$d"): _*)
    base.withColumn("bucket", pmod($"series_id", lit(NumBuckets.toLong)))
  }

  /** Merge one micro-batch into the snapshot at `targetDir`. Public so the
    * spec can drive it deterministically; the streaming query below wires
    * it into foreachBatch. */
  def mergeBatch(batch: DataFrame, targetDir: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val target = new Path(targetDir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val withBucket = batch.withColumn("bucket", pmod($"series_id", lit(NumBuckets.toLong)))
    val touched = withBucket.select($"bucket").distinct()
      .collect().map(_.getLong(0)).sorted  // ≤ NumBuckets values — driver-safe
    if (touched.isEmpty) return
    val manifest = latestManifest(fs, target)
    val (version, bucketMap) = manifest.getOrElse((0L, Map.empty[Long, String]))
    val next = version + 1
    // Existing rows of ONLY the touched buckets, straight from their
    // generation dirs — directory-level pruning, no filter needed.
    val touchedDirs = touched.flatMap(bucketMap.get).map(d => s"$targetDir/$d")
    val existing =
      if (touchedDirs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], barSchema)
      else spark.read.schema(barSchema).parquet(touchedDirs.toSeq: _*)
    val merged = keepLast(existing.unionByName(
        withBucket.select($"series_id", $"bar_date", $"version", $"close")))
      .withColumn("bucket", pmod($"series_id", lit(NumBuckets.toLong)))
    // Scratch write (one Spark job, partitionBy splits per bucket); any
    // leftover from a crashed attempt at THIS version is unreferenced
    // garbage — cleared first, never merged into.
    val scratch = new Path(target, s".delta_v$next")
    fs.delete(scratch, true)
    merged.write.mode("overwrite").partitionBy("bucket").parquet(scratch.toString)
    val newMap = bucketMap ++ publishGenerations(fs, scratch, target, touched, next)
    commitManifest(fs, target, next, newMap)
    collectGarbage(fs, target, next, newMap)
  }

  /** Move each touched bucket's scratch output to its fresh generation dir
    * (`b<bucket>_v<version>`). Nothing a reader can resolve references these
    * dirs until the manifest commits, so a crash here is invisible.
    * Factored out so the atomicity spec can stop between two buckets. */
  private[graft] def publishGenerations(fs: FileSystem, scratch: Path,
      target: Path, touched: Seq[Long], version: Long): Map[Long, String] =
    touched.flatMap { k =>
      val src = new Path(scratch, s"bucket=$k")
      if (!fs.exists(src)) None
      else {
        val name = s"b${k}_v$version"
        val dst = new Path(target, name)
        fs.delete(dst, true) // crashed-attempt leftover, unreferenced
        if (!fs.rename(src, dst))
          throw new java.io.IOException(
            s"upsert: rename $src -> $dst failed; commit not attempted")
        Some(k -> name)
      }
    }.toMap

  /** Post-commit sweep: older manifests, generation dirs the latest
    * manifest no longer references, and scratch dirs. Runs only after the
    * commit rename; a crash mid-sweep leaves garbage the NEXT batch's
    * sweep removes — readers only ever resolve the latest manifest, which
    * is complete. */
  private[graft] def collectGarbage(fs: FileSystem, target: Path,
      latest: Long, live: Map[Long, String]): Unit = {
    val liveDirs = live.values.toSet
    fs.listStatus(target).foreach { s =>
      val n = s.getPath.getName
      n match {
        case ManifestName(v) if v.toLong < latest => fs.delete(s.getPath, false)
        case GenDirName(_, _) if !liveDirs.contains(n) => fs.delete(s.getPath, true)
        case _ if n.startsWith(".delta_v") || n.endsWith(".tmp") =>
          fs.delete(s.getPath, true)
        case _ => ()
      }
    }
  }

  def upsertQuery(spark: SparkSession, streamDir: String, targetDir: String,
      checkpointDir: String): StreamingQuery =
    readBarStream(spark, streamDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => mergeBatch(batch, targetDir) }
      .start()
}
