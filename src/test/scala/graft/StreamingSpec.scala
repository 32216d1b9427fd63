package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  /** File stream sources tail directories; stage the single-file table. */
  lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    d
  }

  test("v02: streaming windowed counts equal the batch equivalent") {
    val q = streaming.EventStream.windowedCounts(spark, streamDir)
      .writeStream.outputMode("append").format("memory").queryName("v02_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    // append mode only emits windows the watermark has closed; with a static
    // file source every window except those within the watermark horizon of
    // the max event time closes. Compare against batch on the closed set.
    val got = spark.table("v02_out")
    assert(got.count() > 0)
    val batch = sources.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("bn"))
    val joined = got.join(batch, Seq("window_start", "event_type"))
    assert(joined.count() == got.count())
    assert(joined.filter(col("n") =!= col("bn")).count() == 0)
  }

  test("v11: native session_window streaming agg matches its batch twin on the closed set") {
    val q = streaming.EventStream.sessionWindows(spark, streamDir)
      .writeStream.outputMode("append").format("memory").queryName("v11_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("v11_out")
    assert(got.count() > 0)
    val batch = streaming.EventStream.sessionWindowsBatch(spark, sf)
      .withColumnRenamed("n_events", "bn").withColumnRenamed("total_value", "bv")
    // every emitted (watermark-closed) session appears in batch with
    // identical bounds, count and value
    val joined = got.join(batch, Seq("user_id", "session_start_us", "session_close_us"))
    assert(joined.count() == got.count())
    assert(joined.filter(col("n_events") =!= col("bn") || col("total_value") =!= col("bv"))
      .count() == 0)
    // the native gap semantics agree with v01's lag-cumsum sessionization
    // on this corpus: same number of sessions per user in batch
    val v01 = streaming.EventStream.sessionize(spark, sf)
      .groupBy("user_id").count().withColumnRenamed("count", "c1")
    val vb = batch.groupBy("user_id").count().withColumnRenamed("count", "c2")
    assert(v01.join(vb, Seq("user_id")).filter(col("c1") =!= col("c2")).count() == 0)
  }

  test("v03: stateful sessionizer emits only closed sessions with positive counts") {
    val q = streaming.EventStream.statefulSessions(spark, streamDir)
      .writeStream.outputMode("append").format("memory").queryName("v03_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("v03_out")
    assert(got.filter(col("n_events") < 1).count() == 0)
    // every emitted session is closed (open ones stay in state)
    assert(got.filter(!col("closed")).count() == 0)
  }

  test("v03: a cross-batch late event does not rewind the session clock") {
    import TestSpark.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    // ts column written as LONG nanos — matching the events.parquet shape
    // readEventStream normalizes (timestamp_micros(ts div 1000))
    def write(rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "m", "value")
        .select(lit(1L).as("event_id"), ($"m" * 60L * 1000000000L).as("ts"),
          $"user_id", lit("view").as("event_type"), $"value", lit("{}").as("props"))
        .coalesce(1).write.mode("append").parquet(dir)
    // batch 1: events at minute 0 and 10 (one open session, last = 10)
    write(Seq((7L, 0L, 1.0), (7L, 10L, 1.0)))
    val q = streaming.EventStream.statefulSessions(spark, dir)
      .writeStream.outputMode("append").format("memory").queryName("v03_late").start()
    try {
      q.processAllAvailable()
      // batch 2: a LATE event (minute 5) plus one at minute 31 — the true
      // gap from minute 10 is 21 min < 30, so the session must NOT split
      write(Seq((7L, 5L, 1.0), (7L, 31L, 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    // nothing closed: all four events form one still-open session
    assert(spark.table("v03_late").filter(col("user_id") === 7L).count() == 0)
  }

  test("v04: stream-static join counts equal the batch equivalent") {
    val q = streaming.EventStream.streamStaticJoin(spark, streamDir, sf)
      .writeStream.outputMode("complete").format("memory").queryName("v04_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("v04_out")
    // the driver-gated batch twin (v04b) is the comparison side, so the
    // DuckDB oracle anchors the streaming counts transitively
    val batch = streaming.EventStream.streamStaticJoinBatch(spark, sf)
      .withColumnRenamed("n", "bn")
    val joined = got.join(batch, Seq("cohort", "event_type"))
    assert(joined.count() == got.count() && got.count() > 0)
    assert(joined.filter(col("n") =!= col("bn")).count() == 0)
  }

  test("v06: streaming corpus ingest dedups by content and matches the batch curation count") {
    val docDir = {
      val d = java.nio.file.Files.createTempDirectory("graft_docstream").toString
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        java.nio.file.Paths.get(s"$d/documents.parquet"))
      d
    }
    val q = streaming.DocStream.dedupIngest(spark, docDir)
      .writeStream.outputMode("complete").format("memory").queryName("v06_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("v06_out")
    // the driver-gated batch twin (v06b) is the comparison side, so the
    // DuckDB oracle anchors the streaming ingest counts transitively
    val batch = streaming.DocStream.dedupIngestBatch(spark, sf)
      .withColumnRenamed("n_unique_docs", "bn")
      .withColumnRenamed("total_chars", "bc")
    val joined = got.join(batch, Seq("lang", "source"))
    assert(joined.count() == got.count() && got.count() > 0)
    assert(joined.filter(col("n_unique_docs") =!= col("bn")).count() == 0)
    assert(joined.filter(col("total_chars") =!= col("bc")).count() == 0)
  }

  test("v14: streaming chunk ingest dedups chunk content and matches the batch twin") {
    val docDir = {
      val d = java.nio.file.Files.createTempDirectory("graft_chunkstream").toString
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        java.nio.file.Paths.get(s"$d/documents.parquet"))
      d
    }
    val q = streaming.DocStream.chunkIngest(spark, docDir)
      .writeStream.outputMode("complete").format("memory").queryName("v14_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("v14_out")
    // the driver-gated batch twin (v14b) is the comparison side, so the
    // DuckDB oracle anchors the streamed chunk admission transitively
    val batch = streaming.DocStream.chunkIngestBatch(spark, sf)
      .withColumnRenamed("n_unique_chunks", "bn")
      .withColumnRenamed("total_chunk_tokens", "bt")
    val joined = got.join(batch, Seq("lang", "source"))
    assert(joined.count() == got.count() && got.count() > 0)
    assert(joined.filter(col("n_unique_chunks") =!= col("bn")).count() == 0)
    assert(joined.filter(col("total_chunk_tokens") =!= col("bt")).count() == 0)
    // the dedup is non-vacuous: fewer admitted chunks than cut chunks
    val cut = operators.TextAnalysis.docChunk(spark, sf).count()
    val admitted = got.agg(sum(col("n_unique_chunks"))).head().getLong(0)
    assert(admitted < cut, s"no duplicate chunk content in the corpus ($admitted vs $cut)")
  }

  test("v07: streaming LSH candidates equal the batch band-collision pair set") {
    val docDir = {
      val d = java.nio.file.Files.createTempDirectory("graft_docstream7").toString
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        java.nio.file.Paths.get(s"$d/documents.parquet"))
      d
    }
    val q = streaming.DocStream.lshCandidates(spark, docDir)
      .writeStream.outputMode("append").format("memory").queryName("v07_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("v07_out").select("doc_a", "doc_b").distinct()
    // the driver-gated batch twin (v07b) is the comparison side, so the
    // DuckDB oracle anchors the streaming candidate set transitively
    val batch = streaming.DocStream.lshCandidatesBatch(spark, sf)
      .select("doc_a", "doc_b")
    assert(got.count() > 0)
    assert(got.exceptAll(batch).count() == 0, "streaming emitted a pair batch banding would not")
    assert(batch.exceptAll(got).count() == 0, "streaming missed a batch band collision")
    // and therefore every verified d03 near-dup pair is detected
    val verified = dedup.Dedup.minhashLsh(spark, sf).select("doc_a", "doc_b")
    assert(verified.exceptAll(got).count() == 0)
  }

  test("v13: streaming phash matches equal the batch verified pair set") {
    import TestSpark.spark.implicits._
    // the sf0.001 image slice has no near-dups, so synthesize a corpus
    // with exact copies (hamming 0) and a one-char same-length edit, and
    // run BOTH the stream and the batch twin over the same directory
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    val edited = base.updated(30, 'x')
    val other = "completely different content about spark shuffles and joins " * 4
    val docs = Seq(
      (0L, base), (3L, base), (6L, edited), (9L, other), (12L, other),
      (1L, base), (2L, base) // non-image ids: must be ignored by the %3 gate
    ).map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // flatten to a single $dir/documents.parquet FILE: the file stream
    // does not recurse into a written directory, and the batch twin's
    // Tables.documents reads the same path either way
    val docDir = java.nio.file.Files.createTempDirectory("graft_docstream13").toString
    val tmp = java.nio.file.Files.createTempDirectory("graft_ds13_w").toString
    docs.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$docDir/documents.parquet"))
    val q = streaming.DocStream.phashMatches(spark, docDir)
      .writeStream.outputMode("append").format("memory").queryName("v13_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("v13_out").select("doc_a", "doc_b", "hamming").distinct()
    // the driver-gated batch twin (v13b) is the comparison side, so the
    // DuckDB oracle anchors the streaming detector transitively
    val batch = streaming.DocStream.phashPairsBatch(spark, docDir)
      .select("doc_a", "doc_b", "hamming")
    assert(got.count() > 0)
    assert(got.exceptAll(batch).count() == 0,
      "streaming emitted a pair the batch banding would not")
    assert(batch.exceptAll(got).count() == 0,
      "streaming missed a batch phash match")
    // the exact copies verify at hamming 0, and non-image ids never enter
    assert(got.filter(col("doc_a") === 0L && col("doc_b") === 3L &&
      col("hamming") === 0).count() == 1)
    assert(got.filter(col("doc_a") % 3 =!= 0 || col("doc_b") % 3 =!= 0).count() == 0)
  }

  test("v13: phash state survives across batches - near-dups split over arrivals are caught") {
    import TestSpark.spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    val other = "completely different content about spark shuffles and joins " * 4
    def write(dir: String, rows: Seq[(Long, String)]): Unit = {
      val df = rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ds13w").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(dir).resolve(s"b${rows.head._1}.parquet"))
      ()
    }
    val docDir = java.nio.file.Files.createTempDirectory("graft_docstream13b").toString
    write(docDir, Seq((0L, base), (9L, other)))
    val q = streaming.DocStream.phashMatches(spark, docDir)
      .writeStream.outputMode("append").format("memory").queryName("v13b_out").start()
    try {
      q.processAllAvailable()
      write(docDir, Seq((3L, base), (12L, other)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("v13b_out").select("doc_a", "doc_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch-1 state must still be live when batch 2 arrives
    assert(got.contains((0L, 3L)), s"cross-batch exact copy lost: $got")
    assert(got.contains((9L, 12L)), s"cross-batch exact copy lost: $got")
    assert(!got.contains((0L, 9L)) && !got.contains((0L, 12L)))
  }

  test("v07: band state survives across batches within the horizon (cross-batch collisions)") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_docstream7b")
    val docs = sources.Tables.documents(spark, sf)
    val cut = 250L
    def addHalf(cond: org.apache.spark.sql.Column, n: Int): Unit = {
      val tmp = Files.createTempDirectory(s"graft_half$n").toString
      docs.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, base.resolve(s"h$n.parquet"))
    }
    addHalf(col("doc_id") < cut, 1)
    val q = streaming.DocStream.lshCandidates(spark, base.toString)
      .writeStream.outputMode("append").format("memory").queryName("v07b_out").start()
    try {
      q.processAllAvailable()
      addHalf(col("doc_id") >= cut, 2)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("v07b_out").select("doc_a", "doc_b").distinct()
    val batch = streaming.DocStream.lshCandidatesBatch(spark, sf)
      .select("doc_a", "doc_b")
    // the batch-1 state must still be live when batch 2 arrives: every
    // cross-cut band collision has to be emitted
    val crossBatch = batch.filter(col("doc_a") < cut && col("doc_b") >= cut)
    assert(crossBatch.count() > 0, "test corpus has no cross-cut collisions; pick another cut")
    assert(crossBatch.exceptAll(got).count() == 0, "cross-batch collisions were lost")
    assert(batch.exceptAll(got).count() == 0)
    assert(got.exceptAll(batch).count() == 0)
  }

  test("v08: stream-stream interval join matches the batch attribution join") {
    val q = streaming.EventStream.viewToPurchase(spark, streamDir)
      .writeStream.outputMode("append").format("memory").queryName("v08_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("v08_out")
    // the driver-gated batch twin (v08b) is the comparison side, so the
    // DuckDB oracle anchors the streaming pair set transitively
    val batch = streaming.EventStream.viewToPurchaseBatch(spark, sf)
    assert(got.count() > 0)
    // append emits once both watermarks close a match; on a replayed static
    // file everything except the trailing horizon closes — every emitted
    // row must be a batch row, and most batch rows must be emitted
    val key = Seq("view_id", "purchase_id")
    assert(got.select(key.map(col): _*).exceptAll(batch.select(key.map(col): _*)).count() == 0)
    assert(got.count().toDouble / batch.count() >= 0.8)
  }

  test("v05: streaming dedup yields exactly the distinct event count") {
    val q = streaming.EventStream.streamDedup(spark, streamDir)
      .writeStream.outputMode("complete").format("memory").queryName("v05_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    // per-type equality against the driver-gated batch twin (v05b), so
    // the DuckDB oracle anchors the streaming counts transitively
    val got = spark.table("v05_out")
    val batch = streaming.EventStream.streamDedupBatch(spark, sf)
      .withColumnRenamed("n", "bn")
    val joined = got.join(batch, Seq("event_type"))
    assert(joined.count() == got.count() && got.count() > 0)
    assert(joined.filter(col("n") =!= col("bn")).count() == 0)
  }

  test("v09: streaming ledger replays to exactly the batch r26 running values") {
    val fillDir = java.nio.file.Files.createTempDirectory("graft_fills").toString
    operators.CciPipeline.orderFills(spark, sf)
      .write.mode("overwrite").parquet(fillDir)
    val q = streaming.LedgerStream.runningLedger(spark, fillDir)
      .writeStream.outputMode("append").format("memory").queryName("v09_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("v09_out")
    val batch = operators.CciPipeline.positionLedger(spark, sf)
    assert(got.count() == batch.count() && got.count() > 0)
    // single-batch replay applies fills in ledger order per account, so
    // every running value must match the batch window cumsum exactly
    val cols = Seq("cust_id", "event_date", "order_no", "side",
      "qty_delta", "cash_delta", "position_qty", "cash_balance").map(col)
    assert(got.select(cols: _*).exceptAll(batch.select(cols: _*)).count() == 0)
  }

  test("v10: streaming upsert sink converges to the batch keep-last snapshot") {
    import TestSpark.spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val streamDir = s"$base/stream"; val targetDir = s"$base/target"
    val ckpt = s"$base/ckpt"
    new java.io.File(streamDir).mkdirs()
    // three waves of bar updates: later versions override, new keys insert
    def wave(rows: Seq[(Long, String, Long, Double)]): Unit =
      rows.toDF("series_id", "d", "version", "close")
        .select($"series_id", to_date($"d").as("bar_date"), $"version", $"close")
        .coalesce(1).write.mode("append").parquet(streamDir)
    val w1 = Seq((1L, "2024-01-01", 1L, 10.0), (2L, "2024-01-01", 1L, 20.0),
      (9L, "2024-01-02", 1L, 90.0))
    val w2 = Seq((1L, "2024-01-01", 2L, 11.5), (3L, "2024-01-01", 1L, 30.0))
    val w3 = Seq((2L, "2024-01-01", 3L, 22.0), (9L, "2024-01-02", 2L, 91.0),
      (17L, "2024-01-03", 1L, 70.0))
    val all = w1 ++ w2 ++ w3
    val q = streaming.UpsertStream.upsertQuery(spark, streamDir, targetDir, ckpt)
    try {
      wave(w1); q.processAllAvailable()
      wave(w2); q.processAllAvailable()
      wave(w3); q.processAllAvailable()
    } finally q.stop()
    val got = streaming.UpsertStream.readSnapshot(spark, targetDir)
      .select($"series_id", $"bar_date", $"version", $"close")
    val expected = streaming.UpsertStream.keepLast(
      all.toDF("series_id", "d", "version", "close")
        .select($"series_id", to_date($"d").as("bar_date"), $"version", $"close"))
    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).count() == 0 && expected.exceptAll(got).count() == 0)
    // the manifest really bucketed the layout: only touched buckets have
    // generation dirs, and the snapshot's derived bucket column agrees
    val buckets = streaming.UpsertStream.readSnapshot(spark, targetDir)
      .select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSet
    val expectedBuckets = all.map(_._1 % streaming.UpsertStream.NumBuckets).toSet
    assert(buckets == expectedBuckets)
  }

  test("v17: streamed as-of enrichment equals the native operator across batches") {
    import TestSpark.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_stream").toString
    // ts written as LONG nanos — the events.parquet shape readEventStream
    // normalizes; minutes keep the arithmetic readable
    def write(rows: Seq[(Long, Long, Long, String)]): Unit =
      rows.toDF("event_id", "m", "user_id", "event_type")
        .select($"event_id", ($"m" * 60L * 1000000000L).as("ts"), $"user_id",
          $"event_type", lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("append").parquet(dir)
    val batch1 = Seq(
      (1L, 0L, 7L, "view"), (2L, 5L, 7L, "purchase"),     // in-batch match
      (3L, 5L, 8L, "purchase"),                            // no view yet
      (4L, 6L, 8L, "view"),
      (10L, 7L, 9L, "view"), (11L, 7L, 9L, "view"))        // equal-ts tie
    val batch2 = Seq(
      (5L, 10L, 8L, "purchase"),                           // cross-batch match (id 4)
      (6L, 12L, 7L, "view"), (7L, 12L, 7L, "purchase"),    // inclusive same-instant
      (12L, 13L, 9L, "purchase"))                          // tie resolved to max id 11
    write(batch1)
    val q = streaming.EventStream.streamAsOf(spark, dir)
      .writeStream.outputMode("append").format("memory").queryName("v17_out").start()
    try {
      q.processAllAvailable()
      write(batch2)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("v17_out")
      .select("purchase_id", "view_id", "matched")
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(2))).toMap
    assert(got == Map(
      2L -> (Some(1L), true), 3L -> (None, false), 5L -> (Some(4L), true),
      7L -> (Some(6L), true), 12L -> (Some(11L), true)))

    // parity with the NATIVE as-of operator (q47's oracle-gated machinery)
    // over the same rows — the stream is anchored transitively
    val all = (batch1 ++ batch2).toDF("event_id", "m", "user_id", "event_type")
      .select($"event_id", $"user_id", $"event_type", ($"m" * 60000000L).as("us"))
    val purchases = all.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"us".as("purchase_us"))
    val views = all.filter($"event_type" === "view")
      .groupBy($"user_id", $"us").agg(max($"event_id").as("view_id"))
      .select($"user_id".as("v_user_id"), $"us".as("view_us"), $"view_id")
    val native = graft.plans.AsOf.join(purchases, views,
        Seq("user_id" -> "v_user_id"), "purchase_us", "view_us")
      .select($"purchase_id", $"view_id")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got.map { case (k, (v, _)) => k -> v } == native)
  }

  test("v01: sessions never overlap and gaps between sessions exceed the threshold") {
    val s = streaming.EventStream.sessionize(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_id")
    val bad = s.withColumn("prev_end_us", lag(col("session_end_us"), 1).over(w))
      .filter(col("prev_end_us").isNotNull &&
        col("session_start_us") - col("prev_end_us") <= streaming.EventStream.SessionGapUs)
    assert(bad.count() == 0)
  }
}
