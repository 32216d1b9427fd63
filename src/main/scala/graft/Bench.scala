package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-query benchmark with FULL materialization: every result is written
  * to the `noop` sink, so projections, window columns and final sorts all
  * execute. (A `count()` action lets Catalyst prune unused projections and
  * eliminate sorts, under-measuring projection-heavy queries.)
  *
  * The CCI chain's shared persisted subtrees (cci → trades → strategyAgg)
  * are warmed ONCE up front and reported as their own `cache_build` entry:
  * per-query numbers are then marginal costs and independent of query
  * order, while the total still includes all work. `SPARK_GRAFT_ONLY=q01,…`
  * skips the warm-up so isolated profiling numbers include the chain build
  * (comparable with cold single-query runs). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // k-bounded typed aggregates: see GraftSession.builder
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Rehearsal hook (round-15): scaled sweeps retune the runtime
    // geometry confs (spark.graft.ann.lshPlanes, spark.graft.range.*,
    // ...) without a recompile — SPARK_GRAFT_CONF="k=v,k=v".
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").filter(_.nonEmpty)
      .foreach { kv =>
        // warn-and-skip malformed entries (ADVICE round-15): an
        // irrefutable Array(k, v) destructure threw a MatchError on any
        // entry missing '=', killing the whole bench before any timing
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => System.err.println(
            s"[bench] WARNING: skipping malformed SPARK_GRAFT_CONF entry '$kv' (no '=')")
        }
      })

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(fn: => Unit): Double =
      try { val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        // a failed query must stand out as -1, not masquerade as a timing
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }

    // Min-of-N protocol (round-11): one run per entry per sweep was below
    // this host's noise floor — identical code swung single entries 2.9 →
    // 28.6 s across same-day sweeps, so a bench that runs each entry once
    // cannot adjudicate its own regressions. Each query entry now runs
    // `SPARK_GRAFT_REPS` times (default 3; always ≥ 2; reps beyond the
    // 2nd are skipped once an entry has spent > 30 s so the heavy tail
    // doesn't triple the sweep) and reports the per-entry MINIMUM — the
    // protocol BASELINE.md already adopted for the replica/engine pair.
    // All reps land in BENCH_LOCAL.json ("reps") for spread inspection.
    // Warm-up entries can't just re-run (a 2nd call returns the session
    // memo, not the build) — they use timedColdReps below, whose reps 2+
    // drop the entry's own memo/caches and rebuild for real.
    val maxReps = math.max(2, sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(3))
    val repBudgetSec = 30.0
    val allReps = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    def timedMin(name: String)(fn: => Unit): Double = {
      val ts = scala.collection.mutable.ArrayBuffer[Double]()
      var cum = 0.0
      var failed = false
      var i = 0
      while (i < maxReps && !failed && (i < 2 || cum <= repBudgetSec)) {
        val t = timed(name)(fn)
        if (t < 0) failed = true else { ts += t; cum += t }
        i += 1
      }
      allReps(name) = ts.toSeq
      if (failed) -1.0 else ts.min
    }
    // Cold-entry reps (round-13): rep 1 is the memoized COLD build (the
    // entry's meaning, and the reported value — comparable across
    // rounds); reps 2+ run `rep`, the fresh-workspace re-orchestration of
    // the same mode, so the reps array makes the cold number's swing
    // adjudicable against a repeatable twin instead of standing alone.
    def timedColdReps(name: String)(cold: => Unit)(rep: => Unit): Double = {
      val ts = scala.collection.mutable.ArrayBuffer[Double]()
      ts += timed(name)(cold)
      var cum = math.max(0.0, ts.head)
      var i = 1
      while (i < maxReps && ts.forall(_ >= 0) && (i < 2 || cum <= repBudgetSec)) {
        val t = timed(name)(rep)
        ts += t; cum += math.max(0.0, t)
        i += 1
      }
      allReps(name) = ts.toSeq
      if (ts.exists(_ < 0)) -1.0 else ts.head
    }

    // SPARK_GRAFT_ONLY=q01,q03 limits the run (profiling); default = all.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Mixed-mode misread guard (round-15, ADVICE): naming a BUILD entry
    // and a query together warms the shared chain before the query runs,
    // so the query's reps are warm-chain numbers while still looking like
    // an isolated cold profile. Legal (the scaled rehearsals do it on
    // purpose) — but say so, so a profile reader can't misfile the number.
    val buildNames = Set("cache_build", "fit_build", "dedup_build",
      "daily_rebuild", "daily_build_fix", "daily_build_bal")
    only.foreach { names =>
      val builds = names.intersect(buildNames)
      val qs = names.filter(SparkEntry.queries.contains)
      if (builds.nonEmpty && qs.nonEmpty)
        System.err.println(s"[bench] WARNING: SPARK_GRAFT_ONLY mixes build " +
          s"entries (${builds.toSeq.sorted.mkString(",")}) with queries " +
          s"(${qs.toSeq.sorted.mkString(",")}): the builds warm shared state " +
          "first, so the query numbers are WARM-chain, not isolated-cold.")
    }
    // deterministic name order: numbers are comparable across runs (Map
    // hash order made warm-cache attribution depend on the run)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Round-14: the three build entries were the bench's last SINGLE-RUN
    // numbers — a driver-sweep swing (round 13: dedup_build 0.95 → 15.5 s)
    // could not be separated from host contention. Each now carries
    // dropped-memo/fresh-workspace rebuild reps: rep 1 stays the memoized
    // COLD build (the entry's meaning, comparable across rounds); reps 2+
    // release the entry's own cached state and rebuild it, leaving the
    // warm state in place for the query entries that follow.
    // Warm entries are skipped in ONLY mode (so a single-query profile
    // includes its own chain build) UNLESS explicitly named — the
    // scaled-SF rehearsals need daily_rebuild et al. without the sweep.
    def warmOn(n: String): Boolean = only.forall(_.contains(n))
    val warm =
      (if (only.isEmpty)
        Seq(
          "cache_build" -> timedColdReps("cache_build")(
            materialize(operators.CciPipeline.strategyAgg(spark, sfDir))) {
            operators.CciPipeline.dropChainCaches(spark, sfDir)
            materialize(operators.CciPipeline.strategyAgg(spark, sfDir))
          },
          // model fits (ALS / KMeans / LBFGS) land here, not in ml01–ml04:
          // a testdata regen invalidates the model workspace and would
          // otherwise move ~25 s of refit into whichever ml query runs
          // first (the round-7 ml04 anomaly)
          "fit_build" -> timedColdReps("fit_build")(
            ml.Features.warmFit(spark, sfDir))(
            ml.Features.rebuildFit(spark, sfDir)),
          // the dedup block's shared doc-shingle cache, warmed as its own
          // entry for the same reason (the round-9 d02↔d07 swap)
          "dedup_build" -> timedColdReps("dedup_build")(
            materialize(graft.dedup.Dedup.sharedShingles(spark, sfDir))) {
            graft.dedup.Dedup.sharedShingles(spark, sfDir).unpersist(true)
            materialize(graft.dedup.Dedup.sharedShingles(spark, sfDir))
          },
          // the composed daily product's two orchestrated week runs
          // (fixed-slice and balance-fed sizing), shared by the r32/r34/
          // r36 gates — warmed here so the bootstrap + day-loop
          // orchestration cost is its own entry instead of landing on
          // whichever daily gate happens to run first. SPLIT entries
          // (round-12): the combined daily_build was 41% of the headline
          // and single-run — a swing could not be localized to a mode.
          // The memoized builds still run once each (a 2nd call returns
          // the memo), but daily_rebuild re-runs the fresh-workspace
          // fixed-mode orchestration under the min-of-N protocol, so the
          // orchestration cost that actually swung is now adjudicable.
          "daily_build_fix" -> timedColdReps("daily_build_fix")(
            Daily.sharedDailyRun(spark, sfDir, balanceFed = false): Unit)(
            Daily.rebuildDailyRun(spark, sfDir, balanceFed = false)),
          "daily_build_bal" -> timedColdReps("daily_build_bal")(
            Daily.sharedDailyRun(spark, sfDir, balanceFed = true): Unit)(
            Daily.rebuildDailyRun(spark, sfDir, balanceFed = true)),
          "daily_rebuild" -> timedMin("daily_rebuild")(
            Daily.rebuildDailyRun(spark, sfDir)))
      else Seq.empty) ++
        (if (only.isEmpty) Seq.empty
         else Seq(
           // ADVICE round-14: keep the DEFAULT-mode order (builds first,
           // daily_rebuild last) — the rebuild reads the CCI chain, so
           // running it before cache_build pre-warmed the chain and
           // cache_build's rep-1 stopped being the cross-round cold build
           ("cache_build", () => timedColdReps("cache_build")(
             materialize(operators.CciPipeline.strategyAgg(spark, sfDir))) {
             operators.CciPipeline.dropChainCaches(spark, sfDir)
             materialize(operators.CciPipeline.strategyAgg(spark, sfDir))
           }),
           ("fit_build", () => timedColdReps("fit_build")(
             ml.Features.warmFit(spark, sfDir))(
             ml.Features.rebuildFit(spark, sfDir))),
           ("dedup_build", () => timedColdReps("dedup_build")(
             materialize(graft.dedup.Dedup.sharedShingles(spark, sfDir))) {
             graft.dedup.Dedup.sharedShingles(spark, sfDir).unpersist(true)
             materialize(graft.dedup.Dedup.sharedShingles(spark, sfDir))
           }),
           ("daily_rebuild", () => timedMin("daily_rebuild")(
             Daily.rebuildDailyRun(spark, sfDir)))).collect {
           case (n, f) if warmOn(n) => n -> f() })
    val queryResults = selected.map { case (name, fn) =>
      name -> timedMin(name)(materialize(fn(spark, sfDir)))
    }

    // ---- x01–x03: Zipf-skew join demo (bench-only; correctness of the
    // variants' equality is asserted in SkewSpec, PERF.md records the
    // comparison). Generated data, so no Verify/oracle row.
    def withConf(pairs: (String, String)*)(fn: => Unit): Unit = {
      val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try fn
      finally olds.foreach { case (k, ov) =>
        ov.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
    val skewOff = "spark.sql.adaptive.skewJoin.enabled" -> "false"
    val skewNames = Seq("x01_skew_join_naive", "x02_skew_join_aqe", "x03_skew_join_salted")
      .filter(n => only.forall(_.contains(n)))
    val skewResults = if (skewNames.isEmpty) Seq.empty[(String, Double)] else {
      import operators.Skew
      // trades cached once: the three entries time the JOIN strategy, not
      // the (identical) generation
      val trades = Skew.zipfTrades(spark, Skew.SkewTradeRows, Skew.SkewSymbols)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stats = Skew.symbolStats(spark, Skew.SkewSymbols)
      trades.count()
      val out = skewNames.map {
        case n @ "x01_skew_join_naive" =>
          // hot symbol (~15% of rows) lands in ONE reducer of the forced
          // sort-merge join: the un-mitigated straggler baseline
          n -> timedMin(n)(withConf(skewOff)(
            materialize(Skew.skewedFeeTotals(trades, stats, salted = false))))
        case n @ "x02_skew_join_aqe" =>
          // AQE skew-split, thresholds sized to the demo corpus (the
          // 256 MB default targets cluster-scale partitions)
          n -> timedMin(n)(withConf(
            "spark.sql.adaptive.skewJoin.enabled" -> "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32m")(
            materialize(Skew.skewedFeeTotals(trades, stats, salted = false))))
        case n =>
          // static salting: hot key spread over SkewSalts reducers with
          // AQE's skew handling off — the no-AQE mitigation
          n -> timedMin(n)(withConf(skewOff)(
            materialize(Skew.skewedFeeTotals(trades, stats, salted = true))))
      }
      trades.unpersist()
      out
    }
    // x04/x05: the CCI chain itself on Zipf-length series — window form
    // (hot series = one sort task) vs the chunked bit-equal rewrite.
    val cciSkewNames = Seq("x04_cci_window_skew", "x05_cci_chunked_skew")
      .filter(n => only.forall(_.contains(n)))
    val cciSkewResults = if (cciSkewNames.isEmpty) Seq.empty[(String, Double)] else {
      import operators.{CciPipeline, Skew}
      val bars = Skew.zipfBars(spark, Skew.SkewBarRows, Skew.SkewBarSeries)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      bars.count()
      val cfg = CciPipeline.GridConfig()
      val out = cciSkewNames.map {
        case n @ "x04_cci_window_skew" =>
          n -> timedMin(n)(materialize(CciPipeline.cciFromBars(bars, cfg)))
        case n =>
          // chunkRows sized so the hot series (~3.8M bars) splits into ~40
          // bounded tasks, not 380: at 10k rows/chunk the per-task overhead
          // (shuffle write, window setup) ate the straggler win and the
          // demo flickered around the crossover (r6 6.9 s win, r7 12.8 s
          // loss, both sweep-tail noise). 100k rows/task is still far under
          // executor memory at any series length — the BOUND is the point.
          n -> timedMin(n)(materialize(
            CciPipeline.cciChunkedFromBars(bars, cfg, chunkRows = 100000)))
      }
      bars.unpersist()
      out
    }
    // Headline = the real query surface (+ cache build). The x-entries are
    // deliberately-naive DEMO baselines (x01/x04 EXIST to be slow) — kept
    // under a separate "demos" key so a contended demo run can never read
    // as a headline regression (the round-5 lesson: x04 recorded 53.8 s in
    // a contended driver run and inflated the total by 44 s).
    val headline = warm ++ queryResults
    val demos = skewResults ++ cciSkewResults
    // total sums SUCCESSFUL entries only: a failed query's -1 marker stays
    // visible in the per-query map but must not subtract from the total
    // (round 7: 39 × -1 made per-query times "sum past" the total and the
    // top-40 fallback printed "other": -13.07)
    val total = headline.map(_._2).filter(_ >= 0).sum
    val nFailed = headline.count(_._2 < 0)
    val demosTotal = demos.map(_._2).filter(_ >= 0).sum
    // Self-adjudicating headline (round-15, VERDICT task 2): `value`
    // keeps its cross-round meaning (cold rep-1 for the build entries +
    // min-of-N for queries), but a single contended cold rep could make
    // it read as a +15% regression that only the reps arrays could
    // dismiss. Emit the decomposition as first-class fields:
    //   cold_total   = value's sum, named for what it is
    //   steady_total = sum of each entry's MINIMUM rep — the number a
    //                  warm, uncontended host would produce; PERF.md's
    //                  cross-round table reads THIS one
    val steadyTotal = headline.flatMap { case (n, v) =>
      if (v < 0) None else allReps.get(n).filter(_.nonEmpty).map(_.min).orElse(Some(v))
    }.sum
    // headline "value" is NULL when anything failed: a round that fails
    // queries sums fewer entries, and a consumer comparing totals without
    // checking `failed` would read the regression as a speed-up. The
    // successful-entries sum stays available as "succeeded_total".
    def totalJson(f: Double => String): String =
      if (nFailed > 0) "null" else f(total)
    // The driver keeps only the LAST 2000 chars of stdout and tries to
    // parse one JSON line out of them; sbt's "[success] Total time..."
    // trailer eats ~80 of those. A full-precision 70-query map is ~3 KB and
    // never fits (BENCH_r01/r02 both recorded parsed: null). Emit a compact
    // line that provably fits, degrading decimals if the query set grows;
    // full precision goes to BENCH_LOCAL.json (committed with the repo).
    def fmt(qs: Seq[(String, Double)], dec: Int): String =
      qs.map { case (k, v) => "\"" + k + "\":" + s"%.${dec}f".format(v) }
        .mkString("{", ",", "}")
    val sfName = new java.io.File(sfDir).getName
    def line(dec: Int): String = {
      def f(v: Double) = s"%.${dec}f".format(v)
      s"""{"metric":"total","value":${totalJson(f)},"unit":"sec","failed":$nFailed,"cold_total":${f(total)},"steady_total":${f(steadyTotal)},"succeeded_total":${f(total)},"queries":${fmt(headline, dec)},"demos":${fmt(demos, dec)},"demos_total":${f(demosTotal)},"sf":"$sfName"}"""
    }
    // fit budget: 2000-char tail − ~81 sbt "[success]" trailer − 7 "[info] "
    // prefix, with a little slack
    val out = Seq(2, 1).map(line).find(_.length <= 1880).getOrElse {
      // last resort: top-40 slowest headline entries + the rest as one
      // "other" bucket (demos are 5 entries — always included verbatim)
      val top = headline.sortBy(-_._2).take(40)
      // "other" buckets only SUCCESSFUL non-top entries (failed -1s would
      // drive it negative); top-40 keeps its -1 markers visible
      val other = total - top.map(_._2).filter(_ >= 0).sum
      s"""{"metric":"total","value":${totalJson("%.2f".format(_))},"unit":"sec","failed":$nFailed,"cold_total":${"%.2f".format(total)},"steady_total":${"%.2f".format(steadyTotal)},"succeeded_total":${"%.2f".format(total)},"queries":${fmt(top :+ ("other" -> other), 2)},"demos":${fmt(demos, 2)},"demos_total":${"%.2f".format(demosTotal)},"sf":"$sfName"}"""
    }
    def full(qs: Seq[(String, Double)]): String =
      qs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val repsJson = allReps
      .map { case (k, ts) => "\"" + k + "\":[" + ts.map("%.2f".format(_)).mkString(",") + "]" }
      .mkString("{", ",", "}")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      s"""{"metric":"total","value":${totalJson(_.toString)},"unit":"sec","failed":$nFailed,"cold_total":$total,"steady_total":$steadyTotal,"succeeded_total":$total,"queries":${full(headline)},"demos":${full(demos)},"demos_total":$demosTotal,"reps":$repsJson,"sf":"$sfDir"}""" + "\n")
    catch { case _: Throwable => () }
    println(out)
    spark.stop()
  }
}
