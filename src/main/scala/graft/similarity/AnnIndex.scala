package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => F}

/** s06: PERSISTED incremental ANN index — the serving artifact s03/s04/s05
  * only model in-session. A production vector store does not re-derive
  * cells and codes per job; it writes them once and serves many query
  * batches from the files, appending new vectors without retraining. The
  * index is a directory:
  *
  *   indexDir/coarse/      (cell, cv)        — IVF centroids, planner-scale
  *   indexDir/codebooks/   (m, k, cv)        — PQ codebooks, planner-scale
  *   indexDir/vectors/     cell=<c>/...      — (vec_id, codes, v, norm),
  *                                             hash-partitioned BY CELL
  *
  * Build trains both quantizers on a bounded ordered sample (the same
  * deterministic seeded Lloyd as s05's codebooks — Similarity.lloyd) and
  * encodes the corpus map-side. Serving reads `coarse` (tiny), ranks cells
  * per query, and scans ONLY the probed cells' partitions (partition
  * pruning on `cell`), ADC-scores the stored codes, then exact-cosine
  * re-ranks the candidate pool — s01's arithmetic, so reported scores are
  * exact. Append encodes a delta with the PERSISTED quantizers (no
  * retrain — the d08 shape: work ∝ delta, never corpus) and appends its
  * cells' files; a committed append is indistinguishable from having
  * built with those rows present under the same quantizers, which the
  * spec asserts as two-batch vs one-batch append equality.
  *
  * At 100 TB: `vectors` is the only large artifact; it shuffles once at
  * build (by cell), serving reads probed cells only, and appends touch
  * only the delta's cells. Approximate by construction → rows-only in the
  * driver (like s04/s05); recall vs s01 and the append/persistence
  * contracts are spec-asserted. */
object AnnIndex {
  import Similarity.{IvfCells, IvfProbe, PqSubspaces, PqCentroids, PqRerank,
    PqTrainMax, PqTrainIters, TopK, lloyd, sqL2}

  /** Train coarse + PQ quantizers on a bounded ordered sample of the
    * frame and persist the full index. Overwrites indexDir. `frame` needs
    * (vec_id, v: array<double>). */
  def buildIndex(spark: SparkSession, frame: DataFrame, indexDir: String): Unit = {
    import spark.implicits._
    val e = withNorm(frame).filter($"norm" > 0)
    val sample: Array[Array[Double]] = e
      .select($"vec_id", transform($"v", x => x / $"norm").as("vn"))
      .orderBy($"vec_id").limit(PqTrainMax)
      .select($"vn").as[Seq[Double]].collect().map(_.toArray)
    require(sample.nonEmpty, "s06 buildIndex: no non-zero vectors to train on")
    val dim = sample(0).length
    val sub = dim / PqSubspaces
    val coarse = lloyd(sample, IvfCells, PqTrainIters)
    val books = Array.tabulate(PqSubspaces) { m =>
      lloyd(sample.map(v => java.util.Arrays.copyOfRange(v, m * sub, (m + 1) * sub)),
        PqCentroids, PqTrainIters)
    }
    coarse.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/coarse")
    books.zipWithIndex.flatMap { case (b, m) =>
      b.zipWithIndex.map { case (c, k) => (m, k, c.toSeq) }
    }.toSeq.toDF("m", "k", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebooks")
    encode(spark, e, coarse, books)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$indexDir/vectors")
  }

  /** Encode NEW vectors with the index's persisted quantizers and append
    * them — work ∝ delta (one map-side encode + the delta's cells'
    * files); no retrain, so existing rows and quantizers are untouched
    * and the append commutes with batching. Caller contract: delta ids
    * are new (an upsert would need a keep-last compaction like r27's). */
  def appendVectors(spark: SparkSession, delta: DataFrame, indexDir: String): Unit = {
    import spark.implicits._
    val (coarse, books) = loadQuantizers(spark, indexDir)
    encode(spark, withNorm(delta).filter($"norm" > 0), coarse, books)
      .write.mode("append").partitionBy("cell").parquet(s"$indexDir/vectors")
  }

  /** Serve a query batch from the persisted index: rank cells by L2
    * against `coarse`, scan only the probed cells (partition pruning on
    * the `cell` dir column), ADC-score codes, exact-cosine re-rank. Query
    * frame needs (vec_id, v); output matches s01's shape. */
  def topK(spark: SparkSession, queries: DataFrame, indexDir: String,
      nProbe: Int = IvfProbe, excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val (coarse, books) = loadQuantizers(spark, indexDir)
    val qv = withNorm(queries).filter($"norm" > 0)
    val queryBatch = Similarity.collectServeBatch(qv
      .select($"vec_id", transform($"v", x => x / $"norm").as("vn"))
      .as[(Long, Seq[Double])], "s06 topK")
    val dim = coarse(0).length
    queryBatch.find(_._2.length != dim).foreach { case (id, vn) =>
      throw new IllegalArgumentException(
        s"s06 topK: query vec_id=$id has dim ${vn.length}, index dim is $dim")
    }
    // duplicate ids in an untrusted batch would each probe and score,
    // then merge under ONE query_id in the final window — a silently
    // mixed top-k instead of an error (and probed.toMap below would
    // drop all but one probe set)
    require(queryBatch.map(_._1).distinct.length == queryBatch.length,
      "s06 topK: duplicate vec_id in the query batch")
    // per-query probe set from the tiny centroid table (first-min ties)
    val probed: Map[Long, Set[Int]] = queryBatch.map { case (id, qn) =>
      id -> coarse.indices
        .sortBy(c => (sqL2(qn, 0, coarse(c)), c)).take(nProbe).toSet
    }.toMap
    val allCells = probed.values.flatten.toSet.toSeq.sorted
    // the pruned scan: only probed cells' partitions are read
    val rows = spark.read.parquet(s"$indexDir/vectors")
      .filter($"cell".isin(allCells: _*))
    val bBooks = spark.sparkContext.broadcast(books)
    val bQ = spark.sparkContext.broadcast(queryBatch)
    val bProbed = spark.sparkContext.broadcast(probed)
    // Per-partition BOUNDED top-k during scoring — the same size-
    // (PqRerank·TopK) max-heap per query as pqTopKWith (Similarity),
    // which exists precisely to avoid a full per-cell sort per query: a
    // partition emits ≤ queries × R·K rows into the merge window, not
    // |probed-cell rows| × queries (at 100 TB a hot probed cell would
    // otherwise funnel its whole population through the window). The
    // merged result is identical: each partition's per-query top-R·K is
    // a superset of its contribution to the global top-R·K.
    val keep = PqRerank * TopK
    val scored = rows.select($"vec_id", $"cell", $"codes")
      .as[(Long, Int, Seq[Int])]
      .mapPartitions { it =>
        val c = bBooks.value; val qs = bQ.value; val pr = bProbed.value
        val luts = qs.map { case (_, q) =>
          Array.tabulate(PqSubspaces)(m =>
            Array.tabulate(c(m).length)(k => sqL2(q, m * c(m)(k).length, c(m)(k))))
        }
        val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
        val heaps = Array.fill(qs.length)(
          new scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord))
        it.foreach { case (vid, cell, codes) =>
          var qi = 0
          while (qi < qs.length) {
            if (pr(qs(qi)._1).contains(cell) &&
                !(excludeSelf && qs(qi)._1 == vid)) {
              var d2 = 0.0; var m = 0
              while (m < PqSubspaces) { d2 += luts(qi)(m)(codes(m)); m += 1 }
              val h = heaps(qi)
              if (h.size < keep) h.enqueue((d2, vid))
              else if (ord.lt((d2, vid), h.head)) { h.dequeue(); h.enqueue((d2, vid)) }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (d2, vid) => (qs(qi)._1, vid, d2) } }
      }.toDF("query_id", "neighbor_id", "d2")
    val wC = Window.partitionBy($"query_id").orderBy($"d2".asc, $"neighbor_id")
    val cands = scored
      .withColumn("crnk", row_number().over(wC))
      .filter($"crnk" <= keep)
      .select($"query_id", $"neighbor_id")
    val corpus = rows.select($"vec_id".as("neighbor_id"), $"v".as("vn2"), $"norm".as("nn"))
    val q = qv.select($"vec_id".as("query_id"), $"v".as("vq"), $"norm".as("nq"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    cands
      .join(corpus, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      // Similarity.cosine, not an inline copy: the byte-identical
      // arithmetic is load-bearing for the exact-score parity contract
      .withColumn("cosine", F.fr(Similarity.cosine($"vq", $"vn2", $"nq", $"nn"), 6))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= TopK)
      .select($"query_id", $"rnk", $"neighbor_id", $"cosine")
      .orderBy($"query_id", $"rnk")
  }

  /** The driver-gated s06 entry: build (overwrite) the index for the sf
    * corpus under /tmp keyed by the dir name, then serve the default
    * query batch (every QueryStride-th vector) from the FILES. Rows-only
    * (approximate by construction, like s04/s05). */
  def indexedTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // sanitized name + a hash of the RAW dir: two distinct dirs that
    // sanitize identically must not silently share (and overwrite) one
    // live index
    val indexDir = s"/tmp/graft_s06_index_${dir.replaceAll("[^A-Za-z0-9]", "_")}_" +
      (dir.hashCode.toLong & 0xffffffffL).toHexString
    buildIndex(spark, graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")), indexDir)
    topK(spark, Similarity.pqQueryDefault(spark, dir), indexDir,
      excludeSelf = true)
  }

  private def withNorm(frame: DataFrame): DataFrame = {
    import frame.sparkSession.implicits._
    frame.select($"vec_id", $"v")
      .withColumn("norm", sqrt(F.foldSum(transform($"v", x => x * x))))
  }

  private def loadQuantizers(spark: SparkSession, indexDir: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    import spark.implicits._
    val coarse = spark.read.parquet(s"$indexDir/coarse")
      .select($"cell", $"cv").as[(Int, Seq[Double])].collect()
      .sortBy(_._1).map(_._2.toArray)
    val books = spark.read.parquet(s"$indexDir/codebooks")
      .select($"m", $"k", $"cv").as[(Int, Int, Seq[Double])].collect()
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3.toArray))
    (coarse, books)
  }

  /** Map-side encode: nearest coarse cell (first-min) + per-subspace PQ
    * codes, against broadcast quantizers. */
  private def encode(spark: SparkSession, e: DataFrame,
      coarse: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    val bCoarse = spark.sparkContext.broadcast(coarse)
    val bBooks = spark.sparkContext.broadcast(books)
    e.select($"vec_id", transform($"v", x => x / $"norm").as("vn"), $"v", $"norm")
      .as[(Long, Seq[Double], Seq[Double], Double)]
      .mapPartitions { it =>
        val cs = bCoarse.value; val bk = bBooks.value
        it.map { case (id, vnSeq, v, norm) =>
          val vn = vnSeq.toArray
          // dimension guard at the encode boundary (build AND append): a
          // wrong-dim vector would otherwise either throw a bare AIOOBE
          // in sqL2 (short) or silently commit index rows whose cell/
          // codes ignore the tail while `norm` covers it (long) — served
          // cosines for such rows would be wrong with no error
          require(vn.length == cs(0).length,
            s"s06 encode: vec_id=$id has dim ${vn.length}, index dim is ${cs(0).length}")
          var cell = 0; var bestD = Double.MaxValue; var c = 0
          while (c < cs.length) {
            val d = sqL2(vn, 0, cs(c))
            if (d < bestD) { bestD = d; cell = c }
            c += 1
          }
          val codes = Array.tabulate(PqSubspaces) { m =>
            var best = 0; var bd = Double.MaxValue; var k = 0
            while (k < bk(m).length) {
              val d = sqL2(vn, m * bk(m)(0).length, bk(m)(k))
              if (d < bd) { bd = d; best = k }
              k += 1
            }
            best
          }
          (id, cell, codes.toSeq, v, norm)
        }
      }.toDF("vec_id", "cell", "codes", "v", "norm")
  }
}
