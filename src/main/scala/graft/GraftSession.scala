package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session factory with graft's scale-oriented defaults.
  *
  * Local testing runs `local[32]`; the same settings are what we would ship
  * on a multi-executor cluster (AQE for runtime re-planning + skew-join
  * handling, modest shuffle partitioning that AQE coalesces further).
  */
object GraftSession {
  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new GraftExtensions)
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ObjectHashAggregate (the physical home of graft_topk /
      // graft_topk_ord / the sketch aggregates) spills to SORT-based
      // aggregation after this many distinct keys per task — the 128
      // default assumes unbounded per-group state, but every typed
      // aggregate this engine plans there is k-bounded (heaps) or
      // constant-size (sketches), so the hash path is safe far beyond
      // it. 64k entries × a k≤25 heap of ~100 B payloads ≈ 160 MB
      // worst-case per task; the sort fallback past that is still the
      // correct memory backstop, this just stops it from engaging on
      // every corpus-keyed (doc_id, query_id) aggregation at key 129.
      //
      // INVARIANT (session-global, so it binds every typed aggregate):
      // per-group buffer state must be BOUNDED — k-heaps, fixed-size
      // sketches, or groups bounded upstream. The raise weakens the
      // sort-fallback memory backstop 512x for anything unbounded.
      // Current collect_list/collect_set sites comply because their
      // groups are bounded before the collect (Dedup span groups are
      // per-document n-gram windows; Daily reco lists are per-user and
      // dimension-scale); a NEW operator collecting unbounded lists over
      // corpus-scale groups must scope this config back down around its
      // own execution (withSQLConf) rather than rely on the session value.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Caller-controlled caching for operators whose subtree is read by
    * several downstream plans (the CCI chain, dedup indexes).
    *
    *  - `spark.graft.cache.enabled=false` turns the persists off entirely —
    *    a single-shot job should not pay cache-build overhead it never
    *    amortizes;
    *  - `spark.graft.cache.storageLevel` picks the level. The default is
    *    MEMORY_AND_DISK_SER, switched from MEMORY_AND_DISK on a ScalingProbe
    *    measurement: at 512× corpus the deserialized d02 inverted-index
    *    cache overflowed the storage fraction and wall-clock went ×11.7 on
    *    ×4 data; serialized, the same point is ×3.4 (bang on the linear
    *    projection, 199.6 s → 65.5 s) and no probe entry got slower at any
    *    multiple. Deserialized caching only wins when the working set
    *    comfortably fits — which a 100 TB shuffle-heavy operator should
    *    never bet on.
    *
    * Lifetime stays with the caller: `spark.catalog.clearCache()` (or
    * `unpersist` on the returned Dataset) releases storage. */
  def maybeCache[T](ds: Dataset[T]): Dataset[T] = {
    val conf = ds.sparkSession.conf
    if (conf.get("spark.graft.cache.enabled", "true").toBoolean) {
      // Re-invocations rebuild an identical plan; CacheManager canonicalizes
      // and would reuse the existing entry but logs a WARN per call. Probe
      // the storage level first so repeat callers are silent no-ops.
      if (ds.storageLevel == StorageLevel.NONE)
        ds.persist(StorageLevel.fromString(
          conf.get("spark.graft.cache.storageLevel", "MEMORY_AND_DISK_SER")))
      else ds
    } else ds
  }

  /** Eager local checkpoint, gated the same way: truncates lineage and
    * materializes NOW (needed when union/self-join branches would race a
    * lazy cache). `spark.graft.eagerCheckpoint.enabled=false` falls back to
    * [[maybeCache]] — on a multi-tenant cluster where executor loss is
    * routine, prefer a reliable `checkpoint()` to an unrecoverable local
    * one. */
  def maybeEagerCheckpoint(ds: Dataset[_]): org.apache.spark.sql.DataFrame = {
    val df = ds.toDF()
    if (df.sparkSession.conf.get("spark.graft.eagerCheckpoint.enabled", "true").toBoolean)
      df.localCheckpoint(true)
    else maybeCache(df)
  }
}
