package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation (SURVEY.md §2 p03): the composition
  * a real LLM-data pipeline runs before tokenization — quality scoring,
  * minimum-length gating, and near-dup cluster canonicalization in one
  * pass over the documents table.
  *
  * Composes t02 (quality columns) with d07 (connected-component dedup
  * clusters): a document survives iff it is its cluster's canonical
  * representative AND its blended quality score clears [[MinQuality]] AND
  * it has at least [[MinTokens]] tokens. Scale shape: both inputs shuffle
  * on doc_id for the join; the cluster side is O(near-dup docs) plus the
  * singleton union, the quality side is a pure map over the scan. */
object Curation {
  val MinQuality = 0.40
  val MinTokens = 5

  // ---------------------------------------------------------------- p03
  def curatedCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val quality = TextAnalysis.qualityScore(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_tokens", $"quality_score")
    val canon = graft.dedup.Dedup.dedupClusters(spark, dir)
      .select($"doc_id", $"cluster_size", $"is_canonical")
    quality
      .join(canon, Seq("doc_id"))
      .filter($"is_canonical" && $"quality_score" >= MinQuality &&
        $"n_tokens" >= MinTokens)
      .select($"doc_id", $"lang", $"source", $"n_tokens",
        $"quality_score", $"cluster_size")
      .orderBy($"doc_id")
  }

  val curatedCorpusSql: String =
    graft.dedup.Dedup.clusterCtes + ",\n" +
      "qual AS (\n" + TextAnalysis.qualityCoreSql + ")\n" +
      s"""SELECT q.doc_id, q.lang, q.source, q.n_tokens,
         |  q.quality_score, c.cluster_size
         |FROM qual q JOIN clus c USING (doc_id)
         |WHERE c.is_canonical AND q.quality_score >= $MinQuality
         |  AND q.n_tokens >= $MinTokens
         |ORDER BY q.doc_id""".stripMargin

  // ---------------------------------------------------------------- p04
  /** Sequence packing (concat-and-chop): lay the corpus out as one token
    * stream in doc_id order and chop it into fixed [[PackWindow]]-token
    * training sequences — each doc gets the pack it starts in and its
    * token offset inside that pack (docs may straddle pack boundaries,
    * as pretraining packing does).
    *
    * The global running sum is the scale trap here: a single
    * unpartitioned window would funnel the corpus through ONE task. This
    * uses the telescoped THREE-level form a 100 TB run needs — an
    * exclusive running sum WITHIN each doc_id bucket, the per-bucket
    * totals exclusive-summed within super-buckets of [[PackBucket]]
    * buckets, and only the super-bucket totals (corpus / PackBucket²
    * rows — ~1e5 for 1e11 docs) through the one unpartitioned window.
    * Every window partition is ≤ PackBucket rows except that final
    * metadata-sized one. The oracle states the same quantity as one flat
    * window — identical values, engine-checkable. PackBucket sizing:
    * SURVEY §5 "Sizing a real deployment". */
  val PackWindow = 512L
  val PackBucket = 1000L

  // ---------------------------------------------------------------- p05
  /** 1/SampleDiv of each stratum is kept (integer-exact quota). */
  val SampleDiv = 4L

  /** p05: deterministic stratified sampling — the exact-allocation
    * downsample every training-data mix step needs (per-(lang, source)
    * quotas, reproducible across runs and engines). Docs rank inside their
    * stratum by a salted content-independent hash of the doc id (uniform,
    * but deterministic — no RNG, so both engines and any rerun agree) and
    * the first ceil(n/SampleDiv) survive.
    *
    * Scale shape: one shuffle on the stratum key for the rank window; the
    * per-stratum quota rides the same window (count over the full
    * partition), so no second pass or join. A skewed mega-stratum is the
    * usual caveat — the hash-rank is still a single partition per stratum,
    * so at 100 TB you'd pre-split hot strata (salt the stratum key, take
    * quota/salt per split) exactly like the skew-join recipe. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{TextFunctions => F}
    val w = Window.partitionBy($"lang", $"source")
    val docs = graft.sources.Tables.documents(spark, dir)
      .withColumn("h", F.polyHash(concat($"doc_id".cast("string"), lit("-p05"))))
    docs
      .withColumn("rn", row_number().over(w.orderBy($"h", $"doc_id")))
      .withColumn("stratum_n", count(lit(1)).over(w).cast("long"))
      .filter($"rn" <= ($"stratum_n" + SampleDiv - 1) / SampleDiv)
      .select($"doc_id", $"lang", $"source", $"stratum_n", $"rn".cast("long").as("rn"))
      .orderBy($"doc_id")
  }

  /** p05's documented hot-stratum swap-in, now code instead of a comment:
    * the stratum key pre-split into `salts` hash sub-strata with the quota
    * taken per split (ceil(split_n / SampleDiv)). The rank window
    * partitions on the SALTED key, so a 100-TB mega-stratum spreads
    * across `salts` tasks instead of funnelling through one; the selected
    * set differs from [[stratifiedSample]] only by per-split ceil rounding
    * (at most `salts - 1` extra docs per stratum, asserted in the spec). */
  /** p05b's sub-stratum count — ONE constant for the Scala default and
    * the oracle SQL (a bare literal on either side would silently fork
    * the gate if the other changed). */
  val PresplitSalts = 8

  def stratifiedSamplePresplit(spark: SparkSession, dir: String,
      salts: Int = PresplitSalts): DataFrame = {
    import spark.implicits._
    import graft.functions.{TextFunctions => F}
    val w = Window.partitionBy($"lang", $"source", $"salt")
    graft.sources.Tables.documents(spark, dir)
      .withColumn("h", F.polyHash(concat($"doc_id".cast("string"), lit("-p05"))))
      .withColumn("salt", pmod($"doc_id", lit(salts.toLong)))
      .withColumn("rn", row_number().over(w.orderBy($"h", $"doc_id")))
      .withColumn("split_n", count(lit(1)).over(w).cast("long"))
      .filter($"rn" <= ($"split_n" + SampleDiv - 1) / SampleDiv)
      .select($"doc_id", $"lang", $"source", $"salt", $"split_n",
        $"rn".cast("long").as("rn"))
  }

  /** p05b: the presplit form as a DRIVER-GATED query row (round-5 left it
    * spec-only). Deterministic salted output — fully SQL-expressible, so
    * the hot-stratum swap-in sits under the same DuckDB oracle gate as the
    * plain form. */
  def stratifiedSamplePresplitQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    stratifiedSamplePresplit(spark, dir).orderBy($"doc_id")
  }

  val stratifiedSamplePresplitSql: String = {
    import graft.functions.{TextSql => S}
    s"""WITH h AS (
       |  SELECT doc_id, lang, source, doc_id % $PresplitSalts AS salt,
       |    ${S.polyHash("CAST(doc_id AS VARCHAR) || '-p05'")} AS hh
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, lang, source, salt,
       |    row_number() OVER (PARTITION BY lang, source, salt ORDER BY hh, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang, source, salt) AS split_n
       |  FROM h)
       |SELECT doc_id, lang, source, CAST(salt AS BIGINT) AS salt,
       |  CAST(split_n AS BIGINT) AS split_n, CAST(rn AS BIGINT) AS rn
       |FROM r
       |WHERE rn <= (split_n + ${SampleDiv - 1}) // $SampleDiv
       |ORDER BY doc_id""".stripMargin
  }

  val stratifiedSampleSql: String = {
    import graft.functions.{TextSql => S}
    s"""WITH h AS (
       |  SELECT doc_id, lang, source,
       |    ${S.polyHash("CAST(doc_id AS VARCHAR) || '-p05'")} AS hh
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, lang, source,
       |    row_number() OVER (PARTITION BY lang, source ORDER BY hh, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang, source) AS stratum_n
       |  FROM h)
       |SELECT doc_id, lang, source, CAST(stratum_n AS BIGINT) AS stratum_n,
       |  CAST(rn AS BIGINT) AS rn
       |FROM r
       |WHERE rn <= (stratum_n + ${SampleDiv - 1}) // $SampleDiv
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- p07
  /** p07: corpus report ("corpus card") — the per-language accounting a
    * dataset release ships: document and token counts, mean quality score
    * and how many documents the repetition gate flags, in one pass over
    * the t02 quality columns left-joined to the t08 repetition verdicts
    * (sub-2-token docs have no verdict and count as not repetitive).
    *
    * Float discipline: the per-language quality mean is derived from an
    * exact integer ten-thousandths sum of the ROUNDED per-doc scores, so
    * the distributed reduction is order-independent (SURVEY.md §6).
    * Scale shape: both inputs shuffle once on doc_id for the join, the
    * rollup is a partial-aggregable groupBy on the language key. */
  def corpusReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{TextFunctions => F}
    val qual = TextAnalysis.qualityScore(spark, dir)
      .select($"doc_id", $"lang", $"n_tokens", $"quality_score")
    val rep = TextAnalysis.repetitionScore(spark, dir)
      .select($"doc_id", $"repetitive")
    qual.join(rep, Seq("doc_id"), "left")
      .withColumn("repetitive", coalesce($"repetitive", lit(false)))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens".cast("long")).as("total_tokens"),
        count($"quality_score").as("n_scored"),
        sum(when($"quality_score".isNotNull,
          floor($"quality_score" * lit(1e4) + 0.5).cast("long"))).as("sum_q4"),
        sum(when($"repetitive", 1L).otherwise(0L)).as("n_repetitive"))
      .select($"lang", $"n_docs", $"total_tokens", $"n_scored",
        F.fr($"sum_q4".cast("double") / lit(1e4) / $"n_scored", 4).as("avg_quality"),
        $"n_repetitive")
      .orderBy($"lang")
  }

  val corpusReportSql: String = {
    import graft.functions.{TextSql => S}
    TextAnalysis.repetitionCtes + ",\n" +
      "qual AS (\n" + TextAnalysis.qualityCoreSql + "),\n" +
      s"""rep AS (
         |  SELECT doc_id,
         |    top_token_frac >= ${TextAnalysis.RepTopTokenFrac}
         |      OR dup_bigram_frac >= ${TextAnalysis.RepDupBigramFrac} AS repetitive
         |  FROM scored),
         |j AS (
         |  SELECT q.lang, q.n_tokens, q.quality_score,
         |    coalesce(r.repetitive, false) AS repetitive
         |  FROM qual q LEFT JOIN rep r USING (doc_id))
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  count(quality_score) AS n_scored,
         |  ${S.fr("CAST(sum(CASE WHEN quality_score IS NOT NULL THEN CAST(floor(quality_score * 1e4 + 0.5) AS BIGINT) END) AS DOUBLE) / 1e4 / count(quality_score)", 4)} AS avg_quality,
         |  CAST(count(CASE WHEN repetitive THEN 1 END) AS BIGINT) AS n_repetitive
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- p06
  /** Target language mix: weight × [[MixFrac]] × total corpus tokens is
    * each language's token budget. */
  val MixWeights: Seq[(String, Double)] =
    Seq("de" -> 0.20, "en" -> 0.40, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.10)
  val MixFrac = 0.25

  /** p06: domain-mix sampling — greedy token-budget fill per language, the
    * data-mixing step that shapes a pretraining corpus to a target
    * distribution (e.g. 40% en / 20% de / …). Docs are taken in
    * deterministic salted-hash order within their language until the
    * language's token budget (weight × MixFrac × total corpus tokens) is
    * exhausted; a doc is taken iff the budget is not already spent before
    * it starts, so runs and engines agree exactly.
    *
    * Scale shape: the corpus token total is a 1-row aggregate joined back
    * broadcast-style (never a driver action); the weight table is a
    * broadcast literal; the per-language running sum is one window shuffle
    * on the language key. A mega-language stratum is the p05 caveat — at
    * 100 TB pre-split hot languages (salt the key, budget/salt per split)
    * exactly like the skew-join recipe. */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{TextFunctions => F}
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source",
        size(F.tokens($"text")).cast("long").as("n_tokens"),
        F.polyHash(concat($"doc_id".cast("string"), lit("-p06"))).as("h"))
    val total = docs.agg(sum($"n_tokens").as("total_tokens"))
    val weights = MixWeights.toDF("lang", "weight")
    val w = Window.partitionBy($"lang").orderBy($"h", $"doc_id")
    docs
      .join(broadcast(weights), Seq("lang"))
      .crossJoin(broadcast(total))
      .withColumn("cum_before", coalesce(
        sum($"n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("lang_budget",
        floor($"weight" * $"total_tokens" * MixFrac).cast("long"))
      .filter($"cum_before" < $"lang_budget")
      .select($"doc_id", $"lang", $"source", $"n_tokens", $"cum_before", $"lang_budget")
      .orderBy($"doc_id")
  }

  val domainMixSql: String = {
    import graft.functions.{TextSql => S}
    // weights as DOUBLE literals: DuckDB would otherwise type 0.20 as
    // DECIMAL and compute the budget exactly while Spark rounds in binary —
    // identical IEEE ops on both sides instead (SURVEY.md §6).
    val values = MixWeights
      .map { case (l, wt) => s"('$l', CAST($wt AS DOUBLE))" }.mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, lang, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    ${S.polyHash("CAST(doc_id AS VARCHAR) || '-p06'")} AS h
       |  FROM documents),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM d),
       |wt AS (SELECT * FROM (VALUES $values) v(lang, weight)),
       |r AS (
       |  SELECT d.doc_id, d.lang, d.source, d.n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY d.lang
       |      ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cum_before,
       |    CAST(floor(wt.weight * tot.total_tokens * $MixFrac) AS BIGINT)
       |      AS lang_budget
       |  FROM d JOIN wt USING (lang) CROSS JOIN tot)
       |SELECT doc_id, lang, source, n_tokens, cum_before, lang_budget
       |FROM r WHERE cum_before < lang_budget
       |ORDER BY doc_id""".stripMargin
  }

  def sequencePack(spark: SparkSession, dir: String): DataFrame =
    sequencePackFrom(graft.sources.Tables.documents(spark, dir))

  /** [[sequencePack]] over any (doc_id, text) frame (synthetic corpora
    * with super-bucket-spanning ids in tests). */
  def sequencePackFrom(docsIn: DataFrame): DataFrame = {
    import docsIn.sparkSession.implicits._
    val docs = docsIn
      .select($"doc_id", size(graft.functions.TextFunctions.tokens($"text"))
        .cast("long").as("n_tokens"))
      .withColumn("bucket", floor($"doc_id" / PackBucket))
    // Level 1: exclusive cumsum within each ~PackBucket-doc bucket.
    val wIn = Window.partitionBy($"bucket").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBucket = docs
      .withColumn("cum_in_bucket", coalesce(sum($"n_tokens").over(wIn), lit(0L)))
    // Level 2: per-bucket totals, exclusive-summed WITHIN each
    // super-bucket of PackBucket buckets. The round-4 flag was a global
    // Window.orderBy(bucket) here — corpus/1000 rows in ONE task; the
    // telescoped form keeps every window partition ≤ PackBucket rows.
    val bucketTotals = docs.groupBy($"bucket")
      .agg(sum($"n_tokens").as("bucket_total"))
      .withColumn("sbucket", floor($"bucket" / PackBucket))
    val wB = Window.partitionBy($"sbucket").orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val inSuper = bucketTotals
      .withColumn("cum_in_super", coalesce(sum($"bucket_total").over(wB), lit(0L)))
    // Level 3: super-bucket totals — corpus/PackBucket² rows (1e11 docs →
    // ~1e5 rows, KBs), the only unpartitioned window; its input shrank
    // 10⁶× so the single task is metadata-sized, and the frame broadcasts.
    // pmod(sbucket, 1) ≡ 0: deliberately ONE partition (the frame is
    // metadata-sized by construction) — a declared constant key, so
    // WindowExec does not warn "No Partition Defined" for what is a
    // designed single task. (A bare lit(0) would be constant-folded out
    // of the partition spec and re-trigger the warning.)
    val wS = Window.partitionBy(pmod($"sbucket", lit(1L))).orderBy($"sbucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val superOffsets = bucketTotals.groupBy($"sbucket")
      .agg(sum($"bucket_total").as("super_total"))
      .withColumn("super_offset", coalesce(sum($"super_total").over(wS), lit(0L)))
      .select($"sbucket", $"super_offset")
    val bucketOffsets = inSuper
      .join(broadcast(superOffsets), Seq("sbucket"))
      .select($"bucket", ($"super_offset" + $"cum_in_super").as("bucket_offset"))
    // No broadcast hint on the bucket-offset join: corpus/1000 rows is
    // broadcastable at test SFs (size-based pick) but must degrade to a
    // shuffle join on the uniform bucket key at 100 TB.
    inBucket
      .join(bucketOffsets, Seq("bucket"))
      .withColumn("cum_before", $"bucket_offset" + $"cum_in_bucket")
      .select($"doc_id", $"n_tokens",
        floor($"cum_before" / PackWindow).as("pack_id"),
        ($"cum_before" % PackWindow).as("pack_offset"))
      .orderBy($"doc_id")
  }

  val sequencePackSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |cum AS (
       |  SELECT doc_id, n_tokens,
       |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM toks)
       |SELECT doc_id, n_tokens,
       |  CAST(floor(cum_before / $PackWindow) AS BIGINT) AS pack_id,
       |  CAST(cum_before % $PackWindow AS BIGINT) AS pack_offset
       |FROM cum
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- p08
  /** Curriculum quality bands (fixed thresholds — a global quantile split
    * would need a full sort; fixed bands are engine-exact AND
    * scale-free). Band boundaries (0.25/0.5/0.75) are exactly
    * representable doubles, so flooring cannot straddle engines. */
  val CurriculumBands = 4
  /** Knuth multiplicative-hash salt for the deterministic within-band
    * shuffle. The id is reduced mod [[CurriculumIdMod]] BEFORE the
    * multiply — 2654435761 × (1e9−1) ≈ 2.7e18 stays inside int64, whereas
    * multiplying a raw 64-bit id first would overflow (ANSI throws) past
    * doc_id ≈ 3.5e9. Same discipline as p02's split hash. */
  val CurriculumSalt = 2654435761L
  val CurriculumIdMod = 1000000000L
  val CurriculumMod = 1000000007L

  /** p08: curriculum ordering — the deterministic global TRAINING ORDER a
    * curriculum-learning run consumes: ascending quality band (easy→hard
    * by the t02 quality score), pseudo-random within a band (salted
    * multiplicative hash — deterministic, resumable, seedable), and one
    * exact global sequence number. Scale shape: the within-band rank is a
    * band-keyed window; band offsets are a [[CurriculumBands]]-row
    * broadcast (p04's two-level cumsum trick — the only global window
    * runs over 4 rows, never the corpus). */
  def curriculum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = TextAnalysis.qualityScore(spark, dir)
      .select($"doc_id", coalesce($"quality_score", lit(0.0)).as("quality"))
    val banded = q
      .withColumn("band",
        least(floor($"quality" * CurriculumBands), lit((CurriculumBands - 1).toDouble))
          .cast("int"))
      .withColumn("ord", (pmod($"doc_id", lit(CurriculumIdMod)) * CurriculumSalt) % CurriculumMod)
    val wIn = Window.partitionBy($"band").orderBy($"ord", $"doc_id")
    // declared single-partition window over CurriculumBands (= 4) rows
    // (pmod keeps the constant key from being folded out — see p04)
    val wB = Window.partitionBy(pmod($"band", lit(1)))
      .orderBy($"band").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = banded.groupBy($"band").agg(count(lit(1)).as("n"))
      .withColumn("band_offset", coalesce(sum($"n").over(wB), lit(0L)))
      .select($"band", $"band_offset")
    banded
      .join(broadcast(offsets), Seq("band"))
      .withColumn("seq", $"band_offset" + row_number().over(wIn) - 1)
      .select($"seq", $"doc_id", $"band", $"quality")
      .orderBy($"seq")
  }

  val curriculumSql: String =
    s"""WITH qs AS (
       |${TextAnalysis.qualityCoreSql}),
       |b AS (
       |  SELECT doc_id, coalesce(quality_score, 0.0) AS quality,
       |    CAST(least(floor(coalesce(quality_score, 0.0) * $CurriculumBands),
       |      ${CurriculumBands - 1}) AS INTEGER) AS band,
       |    ((doc_id % $CurriculumIdMod) * $CurriculumSalt) % $CurriculumMod AS ord
       |  FROM qs),
       |r AS (
       |  SELECT doc_id, quality, band,
       |    row_number() OVER (PARTITION BY band ORDER BY ord, doc_id) AS rk
       |  FROM b),
       |o AS (SELECT band, count(*) AS n FROM b GROUP BY 1),
       |off AS (
       |  SELECT band, coalesce(sum(n) OVER (ORDER BY band
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS band_offset
       |  FROM o)
       |SELECT CAST(off.band_offset + r.rk - 1 AS BIGINT) AS seq,
       |  r.doc_id, r.band, r.quality
       |FROM r JOIN off USING (band)
       |ORDER BY seq""".stripMargin

  // ---------------------------------------------------------------- p09
  /** Pips on the 4-decimal rate grid (10^4): all epoch arithmetic below
    * the one declared rounding happens in exact integers. */
  val TempPips = 10000L

  /** p09: temperature-based domain RESAMPLING (the multilingual
    * temperature-sampling knob of mT5/XLM-R, τ = 0.5): where p06 cuts each
    * language down to a budget, p09 UPsamples low-resource languages by
    * replication so one training epoch sees q_d ∝ p_d^τ instead of the raw
    * p_d. With τ = 0.5 the replication factor collapses to
    * rate_d = √(tokens_max / tokens_d) (the normalizer cancels against the
    * min-rate anchor, so the largest language trains exactly once) — and
    * that closed form is why the oracle can be bit-exact: integer token
    * sums, ONE IEEE divide and ONE sqrt (both correctly rounded on every
    * engine; a general pow(τ) would fork between libms), rounded once onto
    * the 4-decimal grid. Per doc the epoch count is
    * floor(rate) + Bernoulli(frac(rate)) with the deterministic salted
    * polynomial hash as the coin — integer pip arithmetic after the single
    * rounding, so engines and reruns agree exactly.
    *
    * Scale shape: one partial-aggregable groupBy(lang) builds the
    * language-token dimension (langs ≪ corpus); the max anchor is a 1-row
    * aggregate over that dimension; both join back broadcast. Everything
    * per-doc is row-local — NO corpus shuffle at all. */
  def temperatureSample(spark: SparkSession, dir: String): DataFrame =
    temperatureSampleFrom(graft.sources.Tables.documents(spark, dir))

  def temperatureSampleFrom(docsIn: DataFrame): DataFrame = {
    import docsIn.sparkSession.implicits._
    import graft.functions.{TextFunctions => F}
    val docs = docsIn.select($"doc_id", $"lang",
      size(F.tokens($"text")).cast("long").as("n_tokens"),
      pmod(F.polyHash(concat($"doc_id".cast("string"), lit("-p09"))),
        lit(TempPips)).as("h"))
    val langDim = docs.groupBy($"lang").agg(sum($"n_tokens").as("lang_tokens"))
    val anchor = langDim.agg(max($"lang_tokens").as("max_tokens"))
    val rated = langDim.crossJoin(broadcast(anchor))
      .withColumn("rate_pips",
        floor(sqrt($"max_tokens".cast("double") / $"lang_tokens".cast("double"))
          * TempPips + 0.5).cast("long"))
      .select($"lang", $"lang_tokens", $"rate_pips")
    docs.join(broadcast(rated), Seq("lang"))
      .select($"doc_id", $"lang", $"n_tokens",
        ($"rate_pips".cast("double") / TempPips).as("rate"),
        ((($"rate_pips" - $"rate_pips" % TempPips) / TempPips).cast("long") +
          when($"h" < $"rate_pips" % TempPips, 1L).otherwise(0L)).as("n_epochs"))
      .withColumn("emitted_tokens", $"n_tokens" * $"n_epochs")
      .orderBy($"doc_id")
  }

  val temperatureSampleSql: String = {
    import graft.functions.{TextSql => S}
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    ${S.polyHash("CAST(doc_id AS VARCHAR) || '-p09'")} % $TempPips AS h
       |  FROM documents),
       |lt AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens FROM d GROUP BY 1),
       |mx AS (SELECT max(lang_tokens) AS max_tokens FROM lt),
       |r AS (
       |  SELECT lang,
       |    CAST(floor(sqrt(CAST(max_tokens AS DOUBLE) / CAST(lang_tokens AS DOUBLE))
       |      * $TempPips + 0.5) AS BIGINT) AS rate_pips
       |  FROM lt CROSS JOIN mx)
       |SELECT d.doc_id, d.lang, d.n_tokens,
       |  CAST(rate_pips AS DOUBLE) / $TempPips AS rate,
       |  CAST(rate_pips // $TempPips + (CASE WHEN h < rate_pips % $TempPips THEN 1 ELSE 0 END) AS BIGINT) AS n_epochs,
       |  CAST(d.n_tokens * (rate_pips // $TempPips + (CASE WHEN h < rate_pips % $TempPips THEN 1 ELSE 0 END)) AS BIGINT) AS emitted_tokens
       |FROM d JOIN r USING (lang)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- p10
  /** Copies per quality band (band 0..3 via the p08 banding): the top
    * band trains [[RepeatTop]] times, the next [[RepeatMid]], the rest
    * once — the "repeat your best data" knob of data-constrained scaling
    * (Muennighoff et al. 2023: a few epochs over curated data beat one
    * epoch over more). */
  val RepeatTop = 3
  val RepeatMid = 2

  /** p10: QUALITY-WEIGHTED REPETITION schedule — the materialized
    * multi-epoch training order: pass 1 carries every doc, pass 2 the
    * mid-and-up quality bands, pass 3 the top band, each pass internally
    * shuffled by the salted deterministic hash, with ONE exact global
    * sequence number across passes. Complements p08 (single-pass
    * curriculum) and p09 (language upsampling): the repeat axis here is
    * QUALITY, and the repeated stream is materialized with positions, not
    * just counted.
    *
    * Bands are CORPUS-RELATIVE (p08's absolute grid is degenerate when a
    * corpus's scores cluster in one absolute band, which would make every
    * repeat factor 1): the observed [min, max] score range splits into
    * [[CurriculumBands]] equal bands via a 1-row min/max aggregate —
    * exact aggregates and one identical IEEE divide, so both engines band
    * identically.
    *
    * Scale shape: the copy explode is a ≤[[RepeatTop]]-way row-local
    * fan-out; the within-pass rank is a pass-keyed window ([[RepeatTop]]
    * corpus-scale partitions — pre-split per the p05 caveat at the
    * extreme); pass offsets are a 3-row broadcast through the p04
    * two-level trick, so the only global window runs over 3 rows. */
  def qualityRepeat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{TextFunctions => F}
    val q0 = TextAnalysis.qualityScore(spark, dir)
      .select($"doc_id", $"n_tokens",
        coalesce($"quality_score", lit(0.0)).as("quality"))
    val ext = q0.agg(min($"quality").as("q_lo"), max($"quality").as("q_hi"))
    val q = q0.crossJoin(broadcast(ext))
      .withColumn("band",
        when($"q_hi" > $"q_lo",
          least(floor(($"quality" - $"q_lo") / ($"q_hi" - $"q_lo") * CurriculumBands),
            lit((CurriculumBands - 1).toDouble)))
          .otherwise(lit(0.0)).cast("int"))
      .withColumn("repeats",
        when($"band" === CurriculumBands - 1, RepeatTop)
          .when($"band" === CurriculumBands - 2, RepeatMid).otherwise(1))
    val copies = q
      .select($"doc_id", $"n_tokens", $"band",
        explode(sequence(lit(1), $"repeats")).as("copy_idx"))
      .withColumn("ord", F.polyHash(concat(
        $"doc_id".cast("string"), lit("-"), $"copy_idx".cast("string"), lit("-p10"))))
    val wIn = Window.partitionBy($"copy_idx").orderBy($"ord", $"doc_id")
    // declared single-partition window over <= RepeatTop rows (pmod keeps
    // the constant key from being folded out — see p04)
    val wP = Window.partitionBy(pmod($"copy_idx", lit(1)))
      .orderBy($"copy_idx").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = copies.groupBy($"copy_idx").agg(count(lit(1)).as("n"))
      .withColumn("pass_offset", coalesce(sum($"n").over(wP), lit(0L)))
      .select($"copy_idx", $"pass_offset")
    copies
      .join(broadcast(offsets), Seq("copy_idx"))
      .withColumn("seq", $"pass_offset" + row_number().over(wIn) - 1)
      .select($"seq", $"doc_id", $"copy_idx", $"band", $"n_tokens")
      .orderBy($"seq")
  }

  // ---------------------------------------------------------------- p13
  /** Sample size per language for [[weightedSample]]. */
  val WSampleK = 15
  val WSampleSalt = "p13"

  /** p13: WEIGHTED sampling WITHOUT replacement per language — the
    * data-mixing primitive (pick K docs per lang with inclusion odds ∝ a
    * per-doc weight) in an EXACT-INTEGER one-pass form.
    *
    * Scheme: each doc materializes `w` candidate hashes (w ∈ {1..3} from
    * p10's corpus-relative quality bands — "weight the best data") inside
    * one higher-order `transform` (row-local, fan-out bounded by the max
    * weight, never an explode shuffle) and keeps their MIN; the K docs
    * with the smallest min-hash per language are the sample, ranked
    * through the native bounded-heap aggregate (`graft_topk` — one
    * partial-aggregable exchange, no window sort).
    *
    * Why this is exact weighted sampling without replacement: across a
    * language's Σw iid-uniform candidates, the GLOBAL minimum belongs to
    * doc i with probability w_i/Σw; conditioned on i drawn, its
    * candidates leave the pool and the argument repeats — successive
    * minima reproduce the successive-draw distribution exactly
    * (Efraimidis–Spirakis' u^(1/w) keys give the same pairwise law, but
    * need `ln`/`pow`, whose last-ulp libm differences fork engines; the
    * min-of-w form is pure integer polynomial hashing, so the DuckDB
    * oracle is bit-identical). PropertySpec drives the core with
    * controlled weights over many salts and checks the w_i/Σw law.
    *
    * One corpus scan + the 1-row quality-extent broadcast (p10's band
    * discipline) + one aggregate exchange. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q0 = TextAnalysis.qualityScore(spark, dir)
      .select($"doc_id", $"lang",
        coalesce($"quality_score", lit(0.0)).as("quality"))
    val ext = q0.agg(min($"quality").as("q_lo"), max($"quality").as("q_hi"))
    val weighted = q0.crossJoin(broadcast(ext))
      .withColumn("band",
        when($"q_hi" > $"q_lo",
          least(floor(($"quality" - $"q_lo") / ($"q_hi" - $"q_lo") * CurriculumBands),
            lit((CurriculumBands - 1).toDouble)))
          .otherwise(lit(0.0)).cast("int"))
      .withColumn("w",
        when($"band" === CurriculumBands - 1, RepeatTop)
          .when($"band" === CurriculumBands - 2, RepeatMid).otherwise(1))
      .select($"doc_id", $"lang", $"w")
    weightedSampleFrom(weighted, WSampleK, WSampleSalt)
      .orderBy($"lang", $"rank")
  }

  /** The sampling core over an explicit (doc_id, lang, w) frame — shared
    * by the gated row and PropertySpec's distribution gate. */
  private[graft] def weightedSampleFrom(weights: DataFrame, k: Int,
      salt: String): DataFrame = {
    import weights.sparkSession.implicits._
    import graft.functions.{TextFunctions => F}
    import graft.functions.catalyst.GraftColumns
    // Candidate j = (base · q_j) mod P, NOT polyHash(doc#j#salt): the
    // polynomial hash has no avalanche, so hashes differing only in the
    // j digit differ by one FIXED constant across every doc — the w
    // candidate families become overlapping arithmetic progressions and
    // the effective weight of w>1 docs collapses (the first cut of this
    // operator failed its own distribution gate exactly this way).
    // Multiplying by a per-j scrambler mod the prime places each family's
    // small-value preimages independently, restoring the w_i/Σw law.
    weights
      .withColumn("base", F.polyHash(concat($"doc_id".cast("string"), lit("#" + salt))))
      .withColumn("min_h", array_min(transform(sequence(lit(1), $"w"), j =>
        pmod($"base" * F.polyHash(concat(lit(salt + "#"), j.cast("string"))),
          lit(F.HashP)))))
      .groupBy($"lang")
      .agg(GraftColumns.topk_by((-$"min_h").cast("double"), $"doc_id", k).as("top"))
      .select($"lang", posexplode($"top").as(Seq("pos", "t")))
      .select($"lang", ($"pos" + 1).cast("int").as("rank"),
        $"t.id".as("doc_id"), (-$"t.score").cast("long").as("min_h"))
  }

  val weightedSampleSql: String = {
    import graft.functions.{TextSql => S}
    val P = graft.functions.TextFunctions.HashP
    val base = S.polyHash(s"CAST(doc_id AS VARCHAR) || '#$WSampleSalt'")
    val qj = S.polyHash(s"'$WSampleSalt#' || CAST(j AS VARCHAR)")
    val cand = s"(($base) * ($qj)) % $P"
    s"""WITH qs AS (
       |${TextAnalysis.qualityCoreSql}),
       |ext AS (
       |  SELECT min(coalesce(quality_score, 0.0)) AS q_lo,
       |         max(coalesce(quality_score, 0.0)) AS q_hi
       |  FROM qs),
       |b AS (
       |  SELECT doc_id, lang,
       |    CAST(CASE WHEN q_hi > q_lo THEN
       |      least(floor((coalesce(quality_score, 0.0) - q_lo) / (q_hi - q_lo)
       |        * $CurriculumBands), ${CurriculumBands - 1})
       |      ELSE 0.0 END AS INTEGER) AS band
       |  FROM qs CROSS JOIN ext),
       |h AS (
       |  SELECT doc_id, lang,
       |    list_min(list_transform(range(1,
       |      (CASE WHEN band = ${CurriculumBands - 1} THEN $RepeatTop
       |            WHEN band = ${CurriculumBands - 2} THEN $RepeatMid
       |            ELSE 1 END) + 1),
       |      j -> $cand)) AS min_h
       |  FROM b),
       |r AS (
       |  SELECT lang, doc_id, min_h,
       |    row_number() OVER (PARTITION BY lang ORDER BY min_h, doc_id) AS rk
       |  FROM h)
       |SELECT lang, CAST(rk AS INT) AS rank, doc_id, min_h
       |FROM r WHERE rk <= $WSampleK
       |ORDER BY lang, rank""".stripMargin
  }

  // ---------------------------------------------------------------- p11
  /** p11: corpus MANIFEST — the content-addressed integrity record a
    * versioned dataset release ships (what changed between corpus
    * snapshots is a manifest diff, not a 100 TB scan): per (lang, source)
    * group the doc/byte counts, the id range, and an ORDER-INDEPENDENT
    * content fingerprint (bit_xor of each doc's polynomial content hash
    * xor-folded with its id, so moving a doc between groups, editing one
    * byte, or dropping a row all change the group fingerprint). One
    * partial-aggregable groupBy — bit_xor and the counts combine
    * associatively, so the manifest costs one corpus scan at any scale. */
  def corpusManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    manifestOf(graft.sources.Tables.documents(spark, dir))
      .orderBy($"lang", $"source")
  }

  /** The manifest aggregate over an arbitrary document snapshot (shared
    * by p11's gated row and p12's diff — both snapshots go through the
    * SAME fingerprint arithmetic, so a diff row can only mean a real
    * content difference). Unordered; callers sort. */
  private[operators] def manifestOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.functions.{TextFunctions => F}
    docs
      .select($"lang", $"source", $"doc_id", $"n_chars",
        F.polyHash($"text").bitwiseXOR($"doc_id").as("h"))
      .groupBy($"lang", $"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("n_chars"),
        min($"doc_id").as("min_id"),
        max($"doc_id").as("max_id"),
        expr("bit_xor(h)").as("content_fp"))
  }

  val corpusManifestSql: String = {
    import graft.functions.{TextSql => S}
    s"""WITH h AS (
       |  SELECT lang, source, doc_id, n_chars,
       |    xor(${S.polyHash("text")}, doc_id) AS h
       |  FROM documents)
       |SELECT lang, source, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |  min(doc_id) AS min_id, max(doc_id) AS max_id,
       |  bit_xor(h) AS content_fp
       |FROM h
       |GROUP BY lang, source
       |ORDER BY lang, source""".stripMargin
  }

  /** Snapshot-B derivation constants for p12 (deterministic in-query
    * contamination, t12's convention — the corpus ships no second
    * version): docs with id ≡ [[DiffEditMod]] (mod [[DiffEditDiv]]) get
    * one byte appended (fingerprint flip, counts unchanged), source
    * [[DiffDropSource]] is dropped entirely (removed groups), and docs
    * with id ≡ [[DiffIngestMod]] (mod [[DiffIngestDiv]]) re-ingest under source
    * [[DiffIngestSource]] with ids shifted by [[DiffIngestShift]]
    * (added groups). */
  val DiffEditDiv = 7
  val DiffEditMod = 3
  val DiffIngestDiv = 13
  val DiffIngestMod = 1
  val DiffIngestShift = 10000000L
  val DiffDropSource = "src19"
  val DiffIngestSource = "ingest"

  // ---------------------------------------------------------------- p12
  /** p12: corpus SNAPSHOT DIFF — p11's promise made a query. Releasing
    * corpus v2 next to v1 must answer "what changed" WITHOUT comparing
    * content: each snapshot folds to its dimension-scale manifest (one
    * partial-aggregable scan each — at 100 TB the manifests are a few
    * thousand rows), and the diff is a FULL OUTER join of the two on the
    * group key with a four-way status verdict: `added` (group only in B),
    * `removed` (only in A), `changed` (doc/byte counts or the
    * order-independent content fingerprint differ), `unchanged`. The
    * fingerprint is what makes `unchanged` TRUSTWORTHY: any one-byte
    * edit, dropped row, or id move flips it (spec-proven on p11). */
  def manifestDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = graft.GraftSession.maybeCache(
      graft.sources.Tables.documents(spark, dir)
        .select($"doc_id", $"text", $"lang", $"source", $"n_chars"))
    val edited = a.filter($"source" =!= DiffDropSource)
      .withColumn("text",
        when($"doc_id" % DiffEditDiv === DiffEditMod, concat($"text", lit("!")))
          .otherwise($"text"))
    val added = a.filter($"doc_id" % DiffIngestDiv === DiffIngestMod)
      .select(($"doc_id" + DiffIngestShift).as("doc_id"), $"text", $"lang",
        lit(DiffIngestSource).as("source"), $"n_chars")
    val b = edited.unionByName(added)
    val ma = manifestOf(a).select($"lang", $"source", $"n_docs".as("docs_a"),
      $"n_chars".as("chars_a"), $"content_fp".as("fp_a"))
    val mb = manifestOf(b).select($"lang", $"source", $"n_docs".as("docs_b"),
      $"n_chars".as("chars_b"), $"content_fp".as("fp_b"))
    ma.join(mb, Seq("lang", "source"), "full_outer")
      .select($"lang", $"source",
        when($"docs_a".isNull, lit("added"))
          .when($"docs_b".isNull, lit("removed"))
          .when($"docs_a" =!= $"docs_b" || $"chars_a" =!= $"chars_b" ||
            $"fp_a" =!= $"fp_b", lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        $"docs_a", $"docs_b", $"fp_a", $"fp_b")
      .orderBy($"lang", $"source")
  }

  val manifestDiffSql: String = {
    import graft.functions.{TextSql => S}
    s"""WITH base AS (
       |  SELECT doc_id, text, lang, source, n_chars FROM documents),
       |edited AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % $DiffEditDiv = $DiffEditMod THEN text || '!' ELSE text END AS text,
       |    lang, source, n_chars
       |  FROM base WHERE source <> '$DiffDropSource'),
       |added AS (
       |  SELECT doc_id + $DiffIngestShift AS doc_id, text, lang,
       |    '$DiffIngestSource' AS source, n_chars
       |  FROM base WHERE doc_id % $DiffIngestDiv = $DiffIngestMod),
       |snap_b AS (SELECT * FROM edited UNION ALL SELECT * FROM added),
       |ma AS (
       |  SELECT lang, source, count(*) AS docs_a,
       |    CAST(sum(n_chars) AS BIGINT) AS chars_a,
       |    bit_xor(xor(${S.polyHash("text")}, doc_id)) AS fp_a
       |  FROM base GROUP BY lang, source),
       |mb AS (
       |  SELECT lang, source, count(*) AS docs_b,
       |    CAST(sum(n_chars) AS BIGINT) AS chars_b,
       |    bit_xor(xor(${S.polyHash("text")}, doc_id)) AS fp_b
       |  FROM snap_b GROUP BY lang, source)
       |SELECT coalesce(ma.lang, mb.lang) AS lang,
       |  coalesce(ma.source, mb.source) AS source,
       |  CASE WHEN ma.lang IS NULL THEN 'added'
       |       WHEN mb.lang IS NULL THEN 'removed'
       |       WHEN ma.docs_a <> mb.docs_b OR ma.chars_a <> mb.chars_b
       |         OR ma.fp_a <> mb.fp_b THEN 'changed'
       |       ELSE 'unchanged' END AS status,
       |  ma.docs_a, mb.docs_b, ma.fp_a, mb.fp_b
       |FROM ma FULL OUTER JOIN mb
       |  ON ma.lang = mb.lang AND ma.source = mb.source
       |ORDER BY lang, source""".stripMargin
  }

  val qualityRepeatSql: String =
    s"""WITH qs AS (
       |${TextAnalysis.qualityCoreSql}),
       |ext AS (
       |  SELECT min(coalesce(quality_score, 0.0)) AS q_lo,
       |         max(coalesce(quality_score, 0.0)) AS q_hi
       |  FROM qs),
       |b AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(CASE WHEN q_hi > q_lo THEN
       |      least(floor((coalesce(quality_score, 0.0) - q_lo) / (q_hi - q_lo)
       |        * $CurriculumBands), ${CurriculumBands - 1})
       |      ELSE 0.0 END AS INTEGER) AS band
       |  FROM qs CROSS JOIN ext),
       |c AS (
       |  SELECT doc_id, n_tokens, band, CAST(unnest(range(1,
       |    (CASE WHEN band = ${CurriculumBands - 1} THEN $RepeatTop
       |          WHEN band = ${CurriculumBands - 2} THEN $RepeatMid
       |          ELSE 1 END) + 1)) AS INTEGER) AS copy_idx
       |  FROM b),
       |h AS (
       |  SELECT doc_id, n_tokens, band, copy_idx,
       |    ${graft.functions.TextSql.polyHash(
            "CAST(doc_id AS VARCHAR) || '-' || CAST(copy_idx AS VARCHAR) || '-p10'")} AS ord
       |  FROM c),
       |r AS (
       |  SELECT doc_id, n_tokens, band, copy_idx,
       |    row_number() OVER (PARTITION BY copy_idx ORDER BY ord, doc_id) AS rk
       |  FROM h),
       |o AS (SELECT copy_idx, count(*) AS n FROM c GROUP BY 1),
       |off AS (
       |  SELECT copy_idx, coalesce(sum(n) OVER (ORDER BY copy_idx
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pass_offset
       |  FROM o)
       |SELECT CAST(off.pass_offset + r.rk - 1 AS BIGINT) AS seq,
       |  r.doc_id, r.copy_idx, r.band, r.n_tokens
       |FROM r JOIN off USING (copy_idx)
       |ORDER BY seq""".stripMargin
}
