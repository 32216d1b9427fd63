package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

/** Physical shuffle-count regression guard.
  *
  * SURVEY.md §5's partition-strategy claims ("one shuffle on the series
  * key, windows reuse the partitioning") are load-bearing at 100 TB — an
  * accidental second exchange on a 100 TB input is the single most
  * expensive plan regression an edit can introduce, and nothing else in
  * the suite would notice: results stay correct, only the shuffle volume
  * explodes. This spec pins the exchange count of the queries whose §5
  * claims name a specific shuffle structure.
  *
  * Counts come from the STATIC plan (AQE's initialPlan) at the test SF,
  * where they are deterministic. Join-bearing queries whose exchange
  * count depends on broadcast size estimates (q05, v04b, ...) are pinned
  * with the count the current testdata plans — if a testdata regen flips
  * a borderline broadcast, the assertion message says exactly what moved
  * and the new count can be re-audited rather than silently accepted. */
class ShuffleGuardSpec extends AnyFunSuite {
  import TestSpark._

  private def shuffles(p: SparkPlan): Int = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    inner.collect { case _: ShuffleExchangeLike => 1 }.sum +
      inner.subqueries.map(shuffles).sum
  }

  /** query → audited exchange count (see the claim next to each). */
  private val budgets: Map[String, Int] = Map(
    "q01_pricing_summary" -> 2,  // one agg shuffle + output sort
    "q02_filter_project" -> 1,   // pushdown leaves only the output sort
    "q06_forecast_revenue" -> 1, // scalar agg: single final-merge exchange
    "q09_rollup" -> 2,           // rollup agg + output sort
    "q10_window_rank" -> 2,      // window hash + output sort
    "t01_token_count" -> 1,      // map-side tokenize, one ordering exchange
    "r02_ohlc_bars" -> 2,        // series-key shuffle REUSED by window+agg, + sort
    "r04_cci" -> 1,              // flagship: ONE series-key shuffle, window reuses it
    "v01_sessionize" -> 2,       // ONE user_id shuffle (lag + cumsum + groupBy), + sort
    "v02b_windowed_counts" -> 2, // tumbling agg + sort
    "v11b_session_windows" -> 2, // session_window agg + sort
    "d01_dedup_exact" -> 2,      // hash groupBy + sort
    "v08b_attribution_join" -> 1, // purchases side broadcast at this SF, + sort
    // SURVEY §2 r33 claim "no new corpus shuffle": the corpus side is the
    // SHARED cached cci subtree (cci() persists on construction, so the
    // InMemoryRelation boundary is plan-intrinsic, not suite-order
    // luck); everything outside it is days-dimension — index-bars day
    // agg + index pseudo-key window + output sort. The index CCI joins
    // back via BroadcastExchange (not a shuffle). A 4th exchange here
    // means the corpus join stopped broadcasting or the pseudo key
    // regressed to a corpus-side repartition.
    "r33_index_relative" -> 3,
    // SURVEY §2 p11 claim "one partial-aggregable scan": the manifest is
    // one agg exchange + the output sort — a second agg exchange means
    // the xor fold stopped combining map-side
    "p11_corpus_manifest" -> 2,
    // SURVEY §2 s08 claim "no window/rank state at all": the label join
    // broadcasts the stride query side at this SF, leaving only the
    // output sort exchange; a window/rank regression would add its own
    // hash exchange here
    "s08_range_search" -> 1,
    // SURVEY §2 p13 claim "one partial-aggregable exchange, no window
    // sort": the topk agg exchange + output sort + the 1-row
    // quality-extent aggregate. A 4th exchange means a window/rank or a
    // dedup groupBy crept into the sampler
    "p13_weighted_sample" -> 3,
    // SURVEY §2 t16 claim "ZERO shuffles before the output sort": the
    // encode is row-local; only the ordering exchange exists
    "t16_bpe_encode" -> 1,
    // SURVEY §2 q47 claim "each side shuffles ONCE on its key": left
    // hash(user_id) + right hash(user_id) + output sort — the
    // rightTieBreak merge dedup means NO aggregation exchange exists. A
    // 4th exchange means a dedup agg or repartition crept back in
    "q47_asof_native" -> 3,
    // VERDICT r10 task 7: r08's three per-metric row_number windows (3
    // exchanges + 3 full partition sorts over the strategy table) are now
    // ONE groupBy(user_id) with three k=1 graft_topk_ord heaps (NOT
    // min_by: struct-ordered min_by plans as SortAggregate). The pinned
    // count covers the whole uncached chain: bars/cci/trades upstream
    // shuffles + the single argmax agg exchange + the output sort. At the
    // test SF the upstream joins all broadcast, leaving exactly those
    // two; a regression back to per-metric windows shows up as +2 here.
    "r08_best_of" -> 2,
    // round-11 rank-window → heap/min_by swaps: each budget is the count
    // a window regression would break (+1 window hash exchange and a
    // whole-partition sort each).
    // s01: heap agg exchange + output sort — the q×corpus cross join
    // feeds the heap map-side, nothing else shuffles
    "s01_ann_bruteforce" -> 2,
    // s02 (round 15): the LAST ANN rank window collapsed into the heap,
    // then the sf100 rehearsal added two deliberate exchanges — the
    // PINNED (tbl, bucket) fan-out repartition (AQE coalesced the
    // bytes-tiny bucket shuffle onto 2 tasks while ~50× join fan-out hid
    // behind it — the q48 lesson) and the lean-pair exchange feeding the
    // corpus-vector sort-merge attach (sorting 16-byte pairs instead of
    // pair+query-vector rows: 6.2 GB sf10 sort spill → 0). With the
    // candidate distinct, heap agg and output sort that audits at 5; a
    // 6th exchange (or any Window — PlanGuardSpec's s02 pin) means a
    // rank window or a dedup shuffle crept back in, and a 4-exchange
    // plan means the PIN was lost to AQE coalescing.
    "s02_ann_lsh" -> 5,
    // s04 (round 16): both trained-IVF rank stages collapsed into the
    // heap (VERDICT r15 #1) — ONE probe heap-agg exchange on query_id,
    // which the FINAL heap agg then reuses (the query/member joins
    // broadcast at this SF and preserve the probe partitioning, so the
    // partial+final ObjectHashAggregate pair runs with no exchange
    // between them), + the output sort. A 3rd exchange means a rank
    // window came back or the final heap lost the reused partitioning.
    "s04_ann_ivf_trained" -> 2,
    // t10: tf agg + df agg riding tf's term partitioning + the heap's
    // doc exchange/sort path — a 4th data exchange means the per-doc
    // rank regressed to a window
    "t10_tfidf" -> 3,
    // t13: the NB train/score chain (tokenize aggs, model joins kept as
    // SHUFFLE joins by design — 100 TB vocab must not broadcast — plus
    // distinct/eval splits); the per-doc argmax is the min_by agg, so a
    // 19th exchange means the argmax window came back
    "t13_nb_classifier" -> 18,
    // q48/q49 bin joins: the PINNED (bin, salt) fan-out exchange (AQE
    // must not coalesce it — it sizes by shuffle bytes, blind to the
    // ~70× join fan-out behind them) + the per-key agg exchange + the
    // output sort. Losing the pin (or a dedup shuffle sneaking into
    // q49's meet-once form) shows up as ±1 here.
    "q48_range_join" -> 3,
    "q49_interval_join" -> 3
  )

  test("shuffle guard: audited queries keep their exchange counts") {
    // audit the UNCACHED static plan: suites that ran earlier may have
    // maybeCache'd shared subtrees (r30 caches the bars frame), and
    // CacheManager's plan replacement would swap a scan+agg for an
    // InMemoryRelation and change the exchange count non-deterministically
    // with suite order
    spark.catalog.clearCache()
    val moved = budgets.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      val got = shuffles(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan)
      if (got != want) Some(s"$name planned $got exchanges, audited $want")
      else None
    }
    assert(moved.isEmpty,
      "shuffle structure changed — re-audit before accepting:\n  " +
        moved.mkString("\n  "))
  }
}
