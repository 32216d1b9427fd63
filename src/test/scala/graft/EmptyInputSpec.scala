package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input robustness: every composable (frame-parameterized)
  * entry point must return an EMPTY (or correctly trivial) result on empty
  * input and behave on single-row input — never throw. An incremental
  * pipeline's first run and a fully-filtered partition both hand operators
  * exactly these shapes. */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def oneDoc = Seq((1L, "a b c a b")).toDF("doc_id", "text")

  test("dedup From-operators tolerate empty and singleton corpora") {
    assert(dedup.Dedup.normalizedDedupFrom(emptyDocs).count() == 0)
    assert(dedup.Dedup.normalizedDedupFrom(oneDoc).count() == 1)
    assert(dedup.Dedup.spanDedupFrom(emptyDocs).count() == 0)
    // one doc shares spans with NO other doc: present, zero dup fraction
    val one = dedup.Dedup.spanDedupFrom(oneDoc).collect()
    assert(one.length == 1 &&
      one.head.getDouble(one.head.fieldIndex("dup_frac")) == 0.0)
  }

  test("pair-generating dedup From-operators tolerate empty and singleton corpora") {
    // a singleton corpus has no pair partner: empty PAIR output, no throw
    assert(dedup.Dedup.jaccardPairsFrom(emptyDocs, dedup.Dedup.MaxShingleDf).count() == 0)
    assert(dedup.Dedup.jaccardPairsFrom(oneDoc, dedup.Dedup.MaxShingleDf).count() == 0)
    assert(dedup.Dedup.minhashLshFrom(emptyDocs).count() == 0)
    assert(dedup.Dedup.minhashLshFrom(oneDoc).count() == 0)
    assert(dedup.Dedup.incrementalDedupFrom(emptyDocs).count() == 0)
  }

  test("d13 bloom dedup tolerates an empty corpus and an empty batch") {
    val batch = Seq((1001L, "anything")).toDF("ingest_id", "text")
    val emptyBatch = Seq.empty[(Long, String)].toDF("ingest_id", "text")
    // empty corpus: the sketch aggregate yields null -> everything is new
    val r = dedup.Dedup.bloomDedupFrom(emptyDocs, batch).collect()
    assert(r.length == 1 && r.head.getBoolean(2) && r.head.isNullAt(1))
    assert(dedup.Dedup.bloomDedupFrom(oneDoc, emptyBatch).count() == 0)
  }

  test("text From-operators tolerate empty and singleton corpora") {
    assert(operators.TextAnalysis.repetitionScoreFrom(emptyDocs).count() == 0)
    assert(operators.TextAnalysis.repetitionScoreFrom(oneDoc).count() == 1)
  }

  test("curation/cci/multimodal From-operators tolerate empty and singleton inputs") {
    assert(operators.Curation.sequencePackFrom(emptyDocs).count() == 0)
    val p = operators.Curation.sequencePackFrom(oneDoc).collect()
    assert(p.length == 1 && p.head.getAs[Long]("pack_id") == 0L &&
      p.head.getAs[Long]("pack_offset") == 0L)
    val emptyBars = Seq.empty[(Long, java.sql.Date, Double, Double, Double, Double, Long)]
      .toDF("user_id", "d", "open_pr", "high_pr", "low_pr", "close_pr", "volume")
    val oneBar = Seq((1L, java.sql.Date.valueOf("2024-01-02"), 1.0, 2.0, 0.5, 1.5, 3L))
      .toDF("user_id", "d", "open_pr", "high_pr", "low_pr", "close_pr", "volume")
    val cfg = operators.CciPipeline.GridConfig()
    assert(operators.CciPipeline.cciChunkedFromBars(emptyBars, cfg, 25).count() == 0)
    val c = operators.CciPipeline.cciChunkedFromBars(oneBar, cfg, 25).collect()
    // one bar: idx 1, window unfilled -> null CCI, row present
    assert(c.length == 1 && c.head.getAs[Int]("idx") == 1 &&
      c.head.isNullAt(c.head.fieldIndex("close_cci")))
    val emptyMedia = Seq.empty[(Long, String, Array[Byte])]
      .toDF("doc_id", "media_type", "payload")
    assert(multimodal.Multimodal.decodeFeaturesFrom(emptyMedia).count() == 0)
  }

  test("round-10 From-operators tolerate empty and singleton inputs") {
    // m06 phash: empty frame -> empty; one image -> present, not a dup
    val emptyPayload = Seq.empty[(Long, Array[Byte])].toDF("doc_id", "payload")
    assert(multimodal.Multimodal.imagePhashFrom(emptyPayload).count() == 0)
    val onePayload = Seq((3L, "lone image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val r = multimodal.Multimodal.imagePhashFrom(onePayload).collect()
    assert(r.length == 1 && !r.head.getBoolean(2))
    // t13 naive Bayes: empty corpus, train-only corpus, and eval-only
    // corpus (model with zero classes) must all yield empty, not throw
    val emptyLang = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    assert(operators.TextAnalysis.nbClassifierFrom(emptyLang).count() == 0)
    val trainOnly = Seq((1L, "en", "a b c")).toDF("doc_id", "lang", "text")
    assert(operators.TextAnalysis.nbClassifierFrom(trainOnly).count() == 0)
    val evalOnly = Seq((10L, "en", "a b c")).toDF("doc_id", "lang", "text")
    assert(operators.TextAnalysis.nbClassifierFrom(evalOnly).count() == 0)
  }

  test("streaming keepLast tolerates empty and resolves singleton trivially") {
    val schema = streaming.UpsertStream.barSchema
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    assert(streaming.UpsertStream.keepLast(empty).count() == 0)
    val one = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 1L, 10.0))
      .toDF("series_id", "bar_date", "version", "close")
    assert(streaming.UpsertStream.keepLast(one).count() == 1)
  }

  test("upsert mergeBatch bootstraps an empty target from the first batch") {
    val base = java.nio.file.Files.createTempDirectory("graft_empty_upsert").toString
    val target = s"$base/t"
    val batch = Seq((3L, java.sql.Date.valueOf("2024-01-02"), 1L, 30.0))
      .toDF("series_id", "bar_date", "version", "close")
    streaming.UpsertStream.mergeBatch(batch, target)
    val got = streaming.UpsertStream.readSnapshot(spark, target)
    assert(got.count() == 1)
    assert(got.select("series_id").head.getLong(0) == 3L)
  }

  test("session-7 From-operators tolerate empty and degenerate inputs") {
    // as-of over empty / one-sided event frames
    val evEmpty = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val onlyPurchase = Seq((1L, t0, 7L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val onlyView = Seq((1L, t0, 7L, "view", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(operators.AsOfNative.asofNativeFrom(evEmpty).count() == 0)
    val po = operators.AsOfNative.asofNativeFrom(onlyPurchase).collect()
    assert(po.length == 1 && po.head.isNullAt(po.head.fieldIndex("view_id")))
    assert(operators.AsOfNative.asofNativeFrom(onlyView).count() == 0)

    // BPE encode: empty corpus, empty merge table, empty document
    val emptyMerges = Seq.empty[(String, String)]
    assert(operators.TextAnalysis.bpeEncodeTokens(emptyDocs, emptyMerges).count() == 0)
    val noMerge = operators.TextAnalysis.bpeEncodeTokens(oneDoc, emptyMerges).head()
    assert(noMerge.getSeq[String](2).length > 0) // chars pass through unmerged
    val blankDoc = Seq((1L, "")).toDF("doc_id", "text")
    val blank = operators.TextAnalysis
      .bpeEncodeTokens(blankDoc, Seq(("a", "b"))).head()
    assert(blank.getInt(1) == 0 && blank.getSeq[String](2).isEmpty)

    // weighted sample: empty weights frame and k larger than the group
    val noW = Seq.empty[(Long, String, Int)].toDF("doc_id", "lang", "w")
    assert(operators.Curation.weightedSampleFrom(noW, 5, "s").count() == 0)
    val tiny = Seq((1L, "xx", 2)).toDF("doc_id", "lang", "w")
    val tinyOut = operators.Curation.weightedSampleFrom(tiny, 5, "s").collect()
    assert(tinyOut.length == 1 && tinyOut.head.getInt(1) == 1)

    // audio fingerprint: empty frame; sub-window payloads are excluded
    val noPay = Seq.empty[(Long, Array[Byte])].toDF("doc_id", "payload")
    assert(multimodal.Multimodal.audioFingerprintFrom(noPay).count() == 0)
    val shortPay = Seq((1L, Array.tabulate[Byte](8)(_.toByte)))
      .toDF("doc_id", "payload")
    assert(multimodal.Multimodal.audioFingerprintFrom(shortPay).count() == 0)
  }
}
