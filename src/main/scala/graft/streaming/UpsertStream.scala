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
  * pruning on the bucket filter), and the write uses dynamic partition
  * overwrite so untouched buckets are never rewritten — per-batch cost is
  * proportional to the delta's bucket footprint, not snapshot size. On a
  * real deployment the snapshot would be a transactional table format
  * (the read-merge-overwrite below is the no-transaction fallback and is
  * why the merged frame is fully materialized before the overwrite
  * commits); the PLAN — prune → keep-last per key → dynamic overwrite —
  * is the same.
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
    val existing =
      if (fs.exists(targetPath))
        spark.read.parquet(targetDir).filter($"bucket".isin(touched: _*))
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        barSchema.add("bucket", LongType))
    val merged = keepLast(existing.unionByName(withBucket)
        .select($"series_id", $"bar_date", $"version", $"close"))
      .withColumn("bucket", pmod($"series_id", lit(NumBuckets)))
      .persist()
    merged.count()                           // materialize BEFORE the overwrite deletes inputs
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(targetDir)
    merged.unpersist()
  }

  def upsertQuery(spark: SparkSession, streamDir: String, targetDir: String,
      checkpointDir: String): StreamingQuery =
    readBarStream(spark, streamDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => mergeBatch(batch, targetDir) }
      .start()
}
