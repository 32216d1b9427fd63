package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.functions.{TextFunctions => F, TextSql => S}
import graft.sources.Tables

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

  /** v06's batch twin as a DRIVER-GATED query row (v06b): identical
    * content-hash dedup (keep-first = min doc_id — arrival order IS
    * doc_id order under the synthetic ingest clock), length gate, and
    * per-(lang, source) accounting. One hash groupBy + join-back on the
    * (hash, kept-id) pair (the d01 class) then one partial-aggregable
    * shuffle — trivially 100-TB-safe. StreamingSpec compares the
    * streaming counts against THIS function, so the DuckDB oracle
    * anchors v06 transitively. */
  def dedupIngestBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .withColumn("ch", graft.functions.catalyst.GraftColumns.poly_hash($"text"))
    val keep = docs.groupBy($"ch").agg(min($"doc_id").as("doc_id"))
    docs.join(keep, Seq("ch", "doc_id"))
      .filter(size(F.tokens($"text")) >= MinStreamTokens)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_unique_docs"),
        sum($"n_chars").as("total_chars"))
      .orderBy($"lang", $"source")
  }

  val dedupIngestBatchSql: String =
    s"""WITH h AS (SELECT doc_id, text, lang, source, n_chars,
       |    ${S.polyHash("text")} AS ch FROM documents),
       |k AS (SELECT ch, min(doc_id) AS doc_id FROM h GROUP BY ch)
       |SELECT lang, source, count(*) AS n_unique_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM h JOIN k USING (ch, doc_id)
       |WHERE len(string_split(text, ' ')) >= $MinStreamTokens
       |GROUP BY lang, source
       |ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------- v07
  /** Per-band member cap: a pathological hot band (boilerplate corpus)
    * stops emitting pairs past this many members instead of growing state
    * without bound — the batch d03 df-cap analogue for streams. */
  val MaxBandMembers = 64

  /** Emitted near-dup candidate: `doc_b` arrived while `doc_a` was already
    * in the band's state (doc_a < doc_b after per-batch ordering). */
  final case class LshCandidate(doc_a: Long, doc_b: Long, band: Int)
  /** Public: Spark's state encoder codegen needs constructor access. */
  final case class BandMembers(docIds: List[Long])

  /** v07: streaming MinHash-LSH near-dup candidate detection — the
    * streaming twin of batch d03's candidate generation. Each arriving
    * document computes the same K-wide native minhash signature and the
    * same band keys as the batch operator ([[graft.dedup.Dedup.bandArray]]);
    * a per-band state of previously seen doc ids emits a candidate pair for
    * every collision within the watermark horizon.
    *
    * Inline suppression would need a second stateful aggregation over
    * doc_id (any-band collision); the shape that ships at 100 TB emits the
    * candidate stream instead and lets a downstream batch join run the
    * exact-Jaccard verify (d03's verify stage, unchanged) — detection is
    * latency-critical, verification is not. State is per band key, expired
    * by the event-time timeout at the watermark horizon, and capped at
    * [[MaxBandMembers]]. */
  def lshCandidates(spark: SparkSession, streamDir: String): Dataset[LshCandidate] = {
    import spark.implicits._
    // ingest_ts (the watermarked event-time column) must survive into the
    // stateful operator's input for the event-time timeout to bind
    val bands = graft.dedup.Dedup.minhashSignatures(
        readDocStream(spark, streamDir).withWatermark("ingest_ts", "1 hour"),
        carry = Seq("ingest_ts"))
      .withColumn("bb", explode(graft.dedup.Dedup.bandArray(col("sigs"))))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"),
        col("ingest_ts"))
      .as[(Long, Int, String, java.sql.Timestamp)]
    bands
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[BandMembers, LshCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, _, state: GroupState[BandMembers]) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case ((band, _), rows, state: GroupState[BandMembers]) =>
          val rs = rows.toSeq
          // deterministic within a batch: process in doc_id order
          val arriving = rs.map(_._1).distinct.sorted
          var seen = state.getOption.map(_.docIds).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[LshCandidate]
          arriving.foreach { d =>
            if (seen.size < MaxBandMembers) {
              seen.foreach(p => if (p != d) out += LshCandidate(math.min(p, d), math.max(p, d), band))
              seen = d :: seen
            }
          }
          state.update(BandMembers(seen))
          // Expire the band one horizon after its LATEST arrival — not
          // after the current watermark, which is still 0 in the first
          // batch and would expire every band before the next one.
          // Clamped above the watermark (Spark rejects a timeout <= it).
          val maxTsMs = rs.map(_._4.getTime).max
          state.setTimeoutTimestamp(
            math.max(maxTsMs + 3600L * 1000, state.getCurrentWatermarkMs() + 1))
          out.iterator
      }
  }

  /** v07's batch twin as a DRIVER-GATED query row (v07b): the
    * band-collision candidate pair set with its colliding-band count —
    * exactly the pairs the streaming detector emits within one horizon.
    * `bands` yields ≤1 row per (doc, band), so the joined count(*) IS the
    * distinct colliding-band count. Uncapped, like d03's oracle (the
    * streaming [[MaxBandMembers]] cap is the bounded-state concession; at
    * the test SF no bucket reaches it, which the v07 parity spec proves
    * by exact pair-set equality against THIS function). */
  def lshCandidatesBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = graft.dedup.Dedup.minhashBandsFrom(Tables.documents(spark, dir))
    bands.toDF("doc_a", "band", "bkey")
      .join(bands.toDF("doc_b", "band", "bkey"), Seq("band", "bkey"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_bands"))
      .orderBy($"doc_a", $"doc_b")
  }

  val lshCandidatesBatchSql: String =
    graft.dedup.Dedup.lshBandCtes + "\n" +
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- v13
  /** Emitted image near-dup: `doc_b` arrived while `doc_a` was already in
    * the band's state and their fingerprints verify at Hamming ≤
    * [[graft.multimodal.Multimodal.PHashHammingMax]]. Unlike v07's
    * unverified LSH candidates, the verify here is LOCAL (two longs), so
    * the detector emits confirmed near-dups, no downstream join needed. */
  final case class PhashMatch(doc_a: Long, doc_b: Long, band: Int, hamming: Int)
  /** Public: Spark's state encoder codegen needs constructor access. */
  final case class BandHashes(members: List[(Long, Long)])

  /** v13: STREAMING image near-dup admission — the m06 perceptual dedup
    * at the ingest door. Each arriving image-typed doc hashes through the
    * SAME decode boundary as batch m06 ([[graft.multimodal.Multimodal
    * .pHash64]] — real rasters decode, everything else takes the
    * deterministic byte-sampling fallback), explodes its 4×16-bit band
    * keys, and a per-band state of (doc_id, phash) pairs emits a verified
    * match for every Hamming ≤ 3 collision within the watermark horizon.
    * Banding is EXACT for the radius, so within one horizon the emitted
    * pair set equals batch m06's — the parity spec proves it against the
    * driver-gated v13b twin. State per band key is capped at
    * [[MaxBandMembers]] and expires at the event-time horizon, the v07
    * discipline. */
  def phashMatches(spark: SparkSession, streamDir: String): Dataset[PhashMatch] = {
    import spark.implicits._
    // primitives only in the closure (aliasing the Multimodal object as a
    // local val would capture the non-serializable singleton)
    val nBands = graft.multimodal.Multimodal.PHashBands
    val bands = readDocStream(spark, streamDir)
      .filter(col("doc_id") % 3 === 0 && length(col("text")) > 0)
      .select(col("doc_id"), col("text"), col("ingest_ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .mapPartitions(_.flatMap { case (id, text, ts) =>
        val ph = graft.multimodal.Multimodal.pHash64(text.getBytes("UTF-8"))
        (0 until nBands).iterator.map { k =>
          (id, k, (ph >> (k * 16)) & 0xffffL, ph, ts)
        }
      })
      .toDF("doc_id", "band", "blk", "phash", "ingest_ts")
      .withWatermark("ingest_ts", "1 hour")
      .as[(Long, Int, Long, Long, java.sql.Timestamp)]
    bands
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[BandHashes, PhashMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, _, state: GroupState[BandHashes]) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case ((band, _), rows, state: GroupState[BandHashes]) =>
          val rs = rows.toSeq
          // deterministic within a batch: process in doc_id order
          val arriving = rs.map(r => (r._1, r._4)).distinct.sortBy(_._1)
          var seen = state.getOption.map(_.members).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[PhashMatch]
          arriving.foreach { case (d, ph) =>
            if (seen.size < MaxBandMembers) {
              seen.foreach { case (p, php) =>
                val h = java.lang.Long.bitCount(ph ^ php)
                if (p != d && h <= graft.multimodal.Multimodal.PHashHammingMax)
                  out += PhashMatch(math.min(p, d), math.max(p, d), band, h)
              }
              seen = (d, ph) :: seen
            }
          }
          state.update(BandHashes(seen))
          // expire one horizon after the band's LATEST arrival, clamped
          // above the current watermark (the v07 first-batch lesson)
          val maxTsMs = rs.map(_._5.getTime).max
          state.setTimeoutTimestamp(
            math.max(maxTsMs + 3600L * 1000, state.getCurrentWatermarkMs() + 1))
          out.iterator
      }
  }

  /** Deterministic dup INJECTION for the gated v13b row (t12's
    * non-vacuity discipline): every [[InjectStride]]-th doc re-arrives
    * verbatim under a shifted id, so the verified pair set is non-empty
    * at every SF even when the natural image slice carries no near-dups.
    * The offset is divisible by 3 so image-typing is preserved. */
  val InjectStride = 30L
  val InjectOffset = 3000000000L

  /** v13's batch twin as a DRIVER-GATED query row (v13b): the verified
    * Hamming ≤ 3 pair set with its colliding-band count — exactly the
    * pairs the streaming detector emits within one horizon (the pair-set
    * view of m06, whose gated row keeps per-doc verdicts), over the
    * dup-injected corpus. The parity spec drives [[phashPairsBatch]]
    * (no injection) against the stream on a shared synthesized corpus. */
  def phashPairsGated(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    phashPairsFrom(docs.unionByName(
      docs.filter($"doc_id" % InjectStride === 0)
        .withColumn("doc_id", $"doc_id" + InjectOffset)))
  }

  /** v13's batch twin over the raw corpus at `dir` (the stream parity
    * comparison side). */
  def phashPairsBatch(spark: SparkSession, dir: String): DataFrame =
    phashPairsFrom(Tables.documents(spark, dir))

  private def phashPairsFrom(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs
      .filter($"doc_id" % 3 === 0 && length($"text") > 0)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, graft.multimodal.Multimodal.pHash64(p))
      })
      .toDF("doc_id", "phash")
    val ks = (0 until graft.multimodal.Multimodal.PHashBands).toDF("k")
    val bands = hashed.crossJoin(broadcast(ks))
      .withColumn("blk", expr("shiftright(phash, k * 16) & 65535"))
    bands.select($"doc_id".as("doc_a"), $"phash".as("ph_a"), $"k", $"blk")
      .join(bands.select($"doc_id".as("doc_b"), $"phash".as("ph_b"), $"k", $"blk"),
        Seq("k", "blk"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b", $"ph_a", $"ph_b")
      .agg(count(lit(1)).as("n_bands"))
      .withColumn("hamming", expr("bit_count(ph_a ^ ph_b)"))
      .filter($"hamming" <= graft.multimodal.Multimodal.PHashHammingMax)
      .select($"doc_a", $"doc_b", $"n_bands", $"hamming")
      .orderBy($"doc_a", $"doc_b")
  }

  val phashPairsGatedSql: String =
    s"""WITH dd AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $InjectOffset AS doc_id, text FROM documents
       |  WHERE doc_id % $InjectStride = 0),
       |""".stripMargin +
      graft.multimodal.Multimodal.phashCteChain("dd") + ",\n" +
      s"""pcand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.phash AS ph_a, b.phash AS ph_b, count(*) AS n_bands
         |  FROM bands a JOIN bands b
         |    ON a.k = b.k AND a.blk = b.blk AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT doc_a, doc_b, n_bands, bit_count(xor(ph_a, ph_b)) AS hamming
         |FROM pcand
         |WHERE bit_count(xor(ph_a, ph_b)) <= ${graft.multimodal.Multimodal.PHashHammingMax}
         |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- v14
  /** v14: streaming RAG chunk ingest — arriving documents split into
    * t15's overlapping token windows ROW-LOCALLY (the splitter is a
    * stateless projection, so chunking itself adds no stream state), and
    * recurring chunk CONTENT — exact-duplicate documents, cross-document
    * boilerplate — is admitted once per watermark horizon on the
    * (lang, source, chunk PolyHash) key: the dedup that saves a
    * downstream embedder from re-embedding what its per-source index
    * already holds. The key is GROUP-scoped deliberately: a handful of
    * chunk texts recur across (lang, source) groups, and a global key
    * would attribute such a chunk to whichever copy a micro-batch
    * happened to see first — group-scoping keeps the streamed counts
    * deterministic (identical text ⇒ identical token count, so any kept
    * copy yields the same accounting). State is one key per admitted
    * chunk within the horizon, expired by the watermark. Output:
    * per-(lang, source) admitted-chunk accounting. */
  def chunkIngest(spark: SparkSession, streamDir: String): DataFrame = {
    import spark.implicits._
    graft.operators.TextAnalysis.chunksOf(
        readDocStream(spark, streamDir)
          .select($"doc_id", $"text", $"lang", $"source", $"ingest_ts"))
      .withColumn("chunk_hash",
        graft.functions.catalyst.GraftColumns.poly_hash($"chunk_text"))
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicatesWithinWatermark("lang", "source", "chunk_hash")
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_unique_chunks"),
        sum($"n_chunk_tokens").as("total_chunk_tokens"))
  }

  /** v14's batch twin as a DRIVER-GATED query row (v14b): the identical
    * splitter ([[graft.operators.TextAnalysis.chunksOf]]) and the same
    * group-scoped identity — one row per (lang, source, chunk hash),
    * then the per-group accounting. Two partial-aggregable shuffles
    * (the second over dimension-scale groups) — trivially 100-TB-safe.
    * StreamingSpec compares the streamed counts against THIS function,
    * so the DuckDB oracle anchors v14 transitively. */
  def chunkIngestBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.TextAnalysis.chunksOf(
        Tables.documents(spark, dir)
          .select($"doc_id", $"text", $"lang", $"source"))
      .withColumn("ch",
        graft.functions.catalyst.GraftColumns.poly_hash($"chunk_text"))
      // identical text ⇒ identical token count; min() only pins the plan
      // to a deterministic aggregate
      .groupBy($"lang", $"source", $"ch")
      .agg(min($"n_chunk_tokens").as("n_chunk_tokens"))
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_unique_chunks"),
        sum($"n_chunk_tokens").as("total_chunk_tokens"))
      .orderBy($"lang", $"source")
  }

  val chunkIngestBatchSql: String = {
    val W = graft.operators.TextAnalysis.ChunkTokens
    val S2 = graft.operators.TextAnalysis.ChunkStride
    s"""WITH toks AS (
       |  SELECT doc_id, lang, source, string_split(text, ' ') AS tk
       |  FROM documents),
       |sized AS (
       |  SELECT doc_id, lang, source, tk, len(tk) AS n FROM toks),
       |c AS (
       |  SELECT doc_id, lang, source, tk, n,
       |    unnest(generate_series(0, (n - 1) // $S2)) AS ci
       |  FROM sized),
       |ck AS (
       |  SELECT doc_id, lang, source, CAST(ci AS BIGINT) AS chunk_id,
       |    CAST(len(list_slice(tk, ci * $S2 + 1,
       |      least(ci * $S2 + $W, n))) AS BIGINT) AS n_chunk_tokens,
       |    array_to_string(list_slice(tk, ci * $S2 + 1,
       |      least(ci * $S2 + $W, n)), ' ') AS chunk_text
       |  FROM c),
       |h AS (
       |  SELECT *, ${S.polyHash("chunk_text")} AS ch FROM ck),
       |u AS (
       |  SELECT lang, source, ch, min(n_chunk_tokens) AS n_chunk_tokens
       |  FROM h GROUP BY lang, source, ch)
       |SELECT lang, source, count(*) AS n_unique_chunks,
       |  CAST(sum(n_chunk_tokens) AS BIGINT) AS total_chunk_tokens
       |FROM u
       |GROUP BY lang, source
       |ORDER BY lang, source""".stripMargin
  }
}
