package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed EXACT interpolated quantiles (SQL `percentile` /
  * `quantile_cont` semantics: `pos = q * (n-1)`, linear interpolation
  * between the two bracketing order statistics).
  *
  * The built-in `percentile` aggregate collects every value of a group
  * into one aggregation buffer — with a ~3-value group column that is
  * ~1/3 of the corpus in a single task at any scale. This form never
  * buffers a group anywhere:
  *
  *  1. **Group sizes** — one partial-aggregable `groupBy(g).count()`;
  *     output is dimension-scale (one row per group). From `n_g` the
  *     target ranks are pure arithmetic: each requested quantile needs
  *     at most the two order statistics `floor(q·(n-1))` / `ceil(…)`.
  *  2. **Range-partitioned sort slice** — `repartitionByRange(g, v)` +
  *     `sortWithinPartitions`, Spark's distributed sort: every task holds
  *     a contiguous slice of one-or-more groups and sorts only its slice
  *     (external sort, spills). Persisted for the two sub-passes so both
  *     observe the same sampled range boundaries.
  *  3. **Offsets** — rows per (partition, group): P×G rows to the driver
  *     (the same dimension-scale collect class as the audited sites),
  *     prefix-summed into "global rank of each partition's first row".
  *  4. **Extraction sweep** — one `mapPartitions` pass that emits ONLY
  *     rows whose global rank is a needed order statistic (≤ 2·|qs| per
  *     group corpus-wide). Interpolation then runs on that dimension-
  *     scale extract via broadcast joins.
  *
  * Task memory is O(1) beyond the external sort; scale-out is the range
  * partitioning, not the group cardinality, so a 3-group 100-TB corpus
  * still spreads over every executor.
  *
  * Semantics notes (oracle parity): NULL values are ignored (both Spark
  * `percentile` and DuckDB `quantile_cont` do); a group whose values are
  * all NULL is omitted (Spark would emit it with NULL quantiles — the
  * engine's tables never feed such groups here). Ties may straddle range
  * boundaries only as whole equal-key runs (RangePartitioner binary-
  * searches the key), and equal values make rank choice immaterial.
  */
object Quantiles {

  /** Group-cardinality contract. Both driver collects are dimension-scale
    * in the GROUP count G, not the corpus: sizes is G rows, and the
    * offsets collect is ≤ G + 2P rows (range partitioning gives each task
    * a contiguous (g, v) slice, so a partition adds at most two boundary
    * groups beyond the ones wholly inside it — NOT P×G). 1M groups ≈ a
    * few tens of MB on the driver; beyond that this operator is the wrong
    * shape (per-group data is small enough that a plain groupBy +
    * percentile buffer is no longer the corpus-fraction hazard this form
    * exists to avoid). Guarded, not silent. */
  val MaxGroups = 1000000L

  /** Exact quantiles of `valueCol` (numeric) per `groupCol` (string).
    * Returns `(g, q, value)` — dimension-scale. */
  def exactGroupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    val vals = df
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .filter($"g".isNotNull && $"v".isNotNull)

    // pass 1: group sizes (partial-aggregable; dimension-scale result).
    // The limit bounds the collect itself — an over-cardinality group
    // column costs one extra row, not a driver OOM.
    val sizesRows = vals.groupBy($"g").count().limit(MaxGroups.toInt + 1).collect()
    require(sizesRows.length <= MaxGroups,
      s"exactGroupQuantiles: group cardinality exceeds MaxGroups=$MaxGroups " +
        "— the rank-extraction form collects per-group sizes/offsets to the " +
        "driver (dimension-scale by contract); corpus-scale group columns " +
        "have small per-group data and belong on a plain groupBy percentile")
    val sizes: Map[String, Long] =
      sizesRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    if (sizes.isEmpty)
      return spark.emptyDataset[(String, Double, Double)].toDF("g", "q", "value")

    // target order statistics per (group, quantile) — pure arithmetic,
    // mirroring Spark's Percentile: pos = q*(n-1), bracketing lo/hi
    val targets: Seq[(String, Double, Long, Long, Double)] = for {
      (g, n) <- sizes.toSeq; q <- qs
    } yield {
      val pos = q * (n - 1)
      val lo = math.floor(pos).toLong
      val hi = math.ceil(pos).toLong
      (g, q, lo, hi, pos - lo)
    }
    val needed: Map[String, Set[Long]] = targets.groupBy(_._1)
      .map { case (g, ts) => g -> ts.flatMap(t => Seq(t._3, t._4)).toSet }

    // pass 2: distributed sort slice, pinned across the two sub-passes
    val parts = spark.sessionState.conf.numShufflePartitions
    val parted = vals
      .repartitionByRange(parts, $"g", $"v")
      .sortWithinPartitions($"g", $"v")
      .withColumn("pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // global rank of each partition's first row per group (P×G rows)
      val offsets: Map[(Int, String), Long] = {
        val counts = parted.groupBy($"pid", $"g").count()
          .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
        counts.groupBy(_._2).flatMap { case (g, rows) =>
          var acc = 0L
          rows.sortBy(_._1).map { case (pid, _, c) =>
            val off = acc; acc += c; (pid, g) -> off
          }
        }
      }
      val bNeeded = spark.sparkContext.broadcast(needed)
      val bOff = spark.sparkContext.broadcast(offsets)
      // extraction sweep: rows arrive sorted by (g, v); emit only the
      // needed order statistics — ≤ 2·|qs| rows per group corpus-wide
      val picked = parted.select($"pid", $"g", $"v")
        .as[(Int, String, Double)]
        .mapPartitions { it =>
          var curG: String = null
          var rank = 0L
          var want: Set[Long] = Set.empty
          it.flatMap { case (pid, g, v) =>
            if (g != curG) {
              curG = g
              rank = bOff.value.getOrElse((pid, g), 0L)
              want = bNeeded.value.getOrElse(g, Set.empty)
            }
            val hit = if (want.contains(rank)) Iterator.single((g, rank, v))
                      else Iterator.empty
            rank += 1L
            hit
          }
        }
        .toDF("g", "rank", "v")
        // dimension-scale from here on; cache so the two joins below
        // don't re-run the sweep
        .persist(StorageLevel.MEMORY_AND_DISK)

      val tdf = targets.toDF("g", "q", "lo", "hi", "frac")
      val out = tdf
        .join(broadcast(picked.select($"g", $"rank".as("lo"), $"v".as("v_lo"))),
          Seq("g", "lo"))
        .join(broadcast(picked.select($"g", $"rank".as("hi"), $"v".as("v_hi"))),
          Seq("g", "hi"))
        .select($"g", $"q",
          ($"v_lo" + $"frac" * ($"v_hi" - $"v_lo")).as("value"))
      // Materialize before unpersisting the lineage inputs — ON THE
      // EXECUTORS. An eager localCheckpoint truncates lineage (so the
      // unpersists below can't trigger a recompute) without routing the
      // result through the driver: at the MaxGroups=1M contract ceiling
      // the previous collect()+parallelize(rows, 1) pulled ~|qs|×1M rows
      // driver-side, undercutting the operator's own no-driver-buffering
      // story. QuantilesSpec pins the result plan collect-free.
      //
      // Durability caveat (ADVICE round-14): localCheckpoint blocks are
      // UNREPLICATED executor-local storage — after the unpersists below
      // drop the lineage inputs, losing an executor makes the returned
      // frame fail-on-read (no recompute path). Harmless in local mode
      // (one JVM: executor loss = driver loss); on a lossy cluster,
      // either consume the frame promptly or set a reliable checkpoint
      // dir, which this operator honors below (HDFS-backed
      // checkpoint(true) survives executor loss at the cost of one
      // distributed write — still never driver-routed).
      val out2 =
        if (spark.sparkContext.getCheckpointDir.isDefined &&
            !spark.sparkContext.isLocal) out.checkpoint(true)
        else out.localCheckpoint(true)
      picked.unpersist()
      out2
    } finally parted.unpersist()
  }
}
