package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{TextFunctions => F}

/** Streaming corpus ingest (SURVEY.md §2 v06): the front door of the
  * LLM-data pipeline as a stream — documents arrive continuously, exact
  * near-real-time dedup runs on a content hash within a watermark horizon,
  * a minimum-length gate drops fragments, and per-(lang, source)
  * unique-document counts accumulate.
  *
  * The content hash is the same native PolyHash the batch dedup uses, so a
  * doc admitted here and the batch d01 operator agree on identity. State is
  * bounded: dedup keys expire with the ingest-time watermark (at 100 TB
  * the horizon is the replay/out-of-order window, not the corpus). */
object DocStream {
  val MinStreamTokens = 3

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-backed document stream with a deterministic synthetic ingest
    * time derived from doc_id (the test corpus carries no timestamps).
    * Based at 2020-01-01, not the epoch: a record stamped exactly at the
    * stream's initial watermark (epoch 0) would be discarded as late by
    * the stateful dedup. */
  def readDocStream(spark: SparkSession, streamDir: String): DataFrame =
    spark.readStream.schema(schema).parquet(streamDir)
      .withColumn("ingest_ts",
        timestamp_micros((col("doc_id") + 1577836800L) * 1000000L))

  /** v06: dedup-by-content-hash + length gate + per-(lang, source)
    * unique-doc accounting. */
  def dedupIngest(spark: SparkSession, streamDir: String): DataFrame = {
    import spark.implicits._
    readDocStream(spark, streamDir)
      .withColumn("content_hash", graft.functions.catalyst.GraftColumns.poly_hash($"text"))
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicatesWithinWatermark("content_hash")
      .filter(size(F.tokens($"text")) >= MinStreamTokens)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_unique_docs"),
        sum($"n_chars").as("total_chars"))
  }
}
