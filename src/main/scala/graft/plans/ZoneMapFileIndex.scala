package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{Decimal, StructType}

/** Zone-map data skipping INSIDE the planner (VERDICT r12 stretch task):
  * a [[FileIndex]] whose `listFiles` applies the footer-derived per-file
  * [min, max] zones to the query's own pushed data filters — the
  * partition-pruning analogue for NON-partition columns, the way
  * Delta/Iceberg surface their statistics to Spark.
  *
  * The r40/r46 operators assemble `spark.read.parquet(files: _*)` from a
  * driver-side plan step, which is correct but OUTSIDE the plan: nothing
  * composes with it (a join over the skipped table re-plans from the full
  * listing, DPP can't see it, and the predicate must be repeated by the
  * caller). Here the listing itself is filter-aware: Catalyst pushes the
  * scan's data filters into `listFiles` (`FileSourceScanExec` passes them
  * for exactly this hook), the index drops every file whose zones are
  * provably disjoint with the conjunctive bounds, and the residual
  * predicate still reaches the parquet reader as PushedFilters — pruning
  * is an optimization, never a semantics change.
  *
  * Bound extraction is CONSERVATIVE: only top-level conjuncts of the
  * shapes `col (<|<=|>|>=|=) literal` (either operand order) over the
  * registered skip columns tighten a bound; anything else is ignored and
  * the affected files stay in the listing. Literal values are widened
  * OUTWARD onto the double grid (lo bounds round down, hi bounds round
  * up) so a 64-bit integral or high-precision decimal literal beyond
  * 2^53 can never tighten a bound past the true predicate range — a
  * boundary-equal file stays listed. A file with no zone row also stays.
  * Soundness: a file is dropped ONLY when its zone cannot intersect
  * bounds implied by predicates the scan itself still applies.
  *
  * LIFECYCLE (round-14): files appended to the layout after construction
  * become visible through [[refresh]] — Spark's own hook (`REFRESH
  * TABLE`, `DataFrame.refresh`): it re-lists the root and derives footer
  * zones for ONLY the new files via the constructor's `zonesFor` callback
  * (per-new-file metadata I/O, the same increment [[graft.operators
  * .ZoneMap.appendZorder]] pays); files that vanished (compaction) drop
  * out of both the listing and the zone set. Statuses and zones are
  * otherwise immutable snapshots — consistent for any one query.
  *
  * At 100 TB the index holds one (file, zones) row per file — the same
  * file-count-scale metadata the operator path memoizes — and listing is
  * a driver-side filter over it: zero data reads, zero Spark jobs.
  */
final class ZoneMapFileIndex(
    root: Path,
    zones0: Array[Row],
    statuses0: Seq[FileStatus],
    /** skip column name -> (zone min field, zone max field) */
    skipCols: Map[String, (String, String)],
    hadoopConf: org.apache.hadoop.conf.Configuration,
    /** footer-zone derivation for files discovered by [[refresh]] —
      * must emit the same row shape as `zones0` (keyed by the QUALIFIED
      * path rendering, matching `FileStatus.getPath.toString`). */
    zonesFor: Seq[Path] => Array[Row],
    /** skip columns whose zone fields are LONGS, not doubles (round-15):
      * timestamp (micros), date and integral columns — the columns real
      * 100-TB skipping bites hardest on. Long zones compare EXACTLY
      * (TimestampType literals are Long micros, integral literals are
      * integral), so no grid-widening is needed for them; only a
      * fractional literal against a long zone rounds, OUTWARD onto the
      * long grid (lo floors, hi ceils). Same (min field, max field)
      * shape as `skipCols`; a column name must appear in only one map. */
    longCols: Map[String, (String, String)] = Map.empty) extends FileIndex {

  // snapshot state, replaced wholesale by refresh() (volatile: a refresh
  // from one thread must publish a consistent (statuses, zones, byPath)
  // triple to planners on others)
  @volatile private var state: (Seq[FileStatus], Array[Row], Map[String, FileStatus]) =
    (statuses0, zones0, statuses0.map(s => s.getPath.toString -> s).toMap)

  private def statuses: Seq[FileStatus] = state._1
  private def zones: Array[Row] = state._2
  private def byPath: Map[String, FileStatus] = state._3

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = StructType(Nil)
  override def inputFiles: Array[String] = statuses.map(_.getPath.toString).toArray
  override def sizeInBytes: Long = statuses.map(_.getLen).sum

  /** Re-list the root and fold in appended files' zones (footer reads for
    * ONLY the new files); drop vanished files. Synchronized so concurrent
    * refreshes never double-derive a file's zones. */
  override def refresh(): Unit = synchronized {
    val fs = root.getFileSystem(hadoopConf)
    val listed = fs.listStatus(root).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
    val listedKeys = listed.map(_.getPath.toString).toSet
    val known = byPath.keySet
    val fresh = listed.filterNot(s => known.contains(s.getPath.toString))
    val keptZones = zones.filter(z => listedKeys.contains(z.getAs[String]("file")))
    val newZones =
      if (fresh.isEmpty) Array.empty[Row] else zonesFor(fresh.map(_.getPath))
    state = (listed, keptZones ++ newZones,
      listed.map(s => s.getPath.toString -> s).toMap)
  }

  /** Literal -> double bound, widened OUTWARD (`up = true` for hi bounds:
    * never below the true value; `up = false` for lo bounds: never above).
    * Exact-on-the-grid values pass through; a Long/Decimal that rounds
    * toward the predicate interior steps one ulp back out. Float/Double
    * literals are already grid values; Int and narrower are exact. */
  private def asBound(v: Any, up: Boolean): Option[Double] = {
    def widen(d: Double, exact: BigDecimal): Double =
      if (d.isInfinite || BigDecimal(d) == exact) d
      else if (up) { if (BigDecimal(d) < exact) Math.nextUp(d) else d }
      else { if (BigDecimal(d) > exact) Math.nextDown(d) else d }
    v match {
      case d: Double => Some(d)
      case f: Float => Some(f.toDouble)
      case i: Int => Some(i.toDouble)
      case s: Short => Some(s.toDouble)
      case b: Byte => Some(b.toDouble)
      case l: Long => Some(widen(l.toDouble, BigDecimal(l)))
      case d: Decimal => Some(widen(d.toDouble, d.toBigDecimal))
      case _ => None
    }
  }

  /** Literal -> LONG bound for the [[longCols]] zones. Integral and
    * timestamp/date literals (Long micros / Int days in Catalyst) are
    * exact on the long grid — no widening. A fractional literal rounds
    * OUTWARD (lo floors, hi ceils); out-of-domain bounds saturate toward
    * the long domain, which only ever KEEPS files (every stored zone
    * value is a long). */
  private def asLongBound(v: Any, up: Boolean): Option[Long] = {
    def frac(x: BigDecimal): Some[Long] = {
      val r = x.setScale(0,
        if (up) BigDecimal.RoundingMode.CEILING else BigDecimal.RoundingMode.FLOOR)
      if (r <= BigDecimal(Long.MinValue)) Some(Long.MinValue)
      else if (r >= BigDecimal(Long.MaxValue)) Some(Long.MaxValue)
      else Some(r.toLong)
    }
    v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case d: Double if d.isNaN => None // never-true predicate; ignore = keep
      case d: Double if d.isInfinite =>
        Some(if (d > 0) Long.MaxValue else Long.MinValue)
      case d: Double => frac(BigDecimal(d))
      case f: Float => asLongBound(f.toDouble, up)
      case d: Decimal => frac(d.toBigDecimal)
      case _ => None
    }
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // consistent snapshot for this one planning pass
    val (snapStatuses, snapZones, snapByPath) = state
    // conservative per-column bounds from the recognizable conjuncts —
    // doubles for skipCols zones, exact longs for longCols zones
    val lo = collection.mutable.Map.empty[String, Double]
    val hi = collection.mutable.Map.empty[String, Double]
    val loL = collection.mutable.Map.empty[String, Long]
    val hiL = collection.mutable.Map.empty[String, Long]
    // a lo bound must round DOWN (the used bound stays ≤ the true one),
    // a hi bound UP — both keep `zone ∩ bounds = ∅ ⇒ zone ∩ pred = ∅`
    def tightenLo(c: String, v: Any): Unit =
      if (skipCols.contains(c))
        asBound(v, up = false).foreach(d =>
          lo.updateWith(c)(p => Some(p.fold(d)(math.max(_, d)))): Unit)
      else
        asLongBound(v, up = false).foreach(l =>
          loL.updateWith(c)(p => Some(p.fold(l)(math.max(_, l)))): Unit)
    def tightenHi(c: String, v: Any): Unit =
      if (skipCols.contains(c))
        asBound(v, up = true).foreach(d =>
          hi.updateWith(c)(p => Some(p.fold(d)(math.min(_, d)))): Unit)
      else
        asLongBound(v, up = true).foreach(l =>
          hiL.updateWith(c)(p => Some(p.fold(l)(math.min(_, l)))): Unit)
    def skip(a: Expression): Option[String] = a match {
      case ar: AttributeReference
          if skipCols.contains(ar.name) || longCols.contains(ar.name) =>
        Some(ar.name)
      case _ => None
    }
    def visit(e: Expression): Unit = e match {
      case And(l, r) => visit(l); visit(r)
      case GreaterThanOrEqual(a, Literal(v, _)) =>
        skip(a).foreach(tightenLo(_, v))
      case GreaterThan(a, Literal(v, _)) =>
        skip(a).foreach(tightenLo(_, v))
      case LessThanOrEqual(a, Literal(v, _)) =>
        skip(a).foreach(tightenHi(_, v))
      case LessThan(a, Literal(v, _)) =>
        skip(a).foreach(tightenHi(_, v))
      case EqualTo(a, Literal(v, _)) =>
        skip(a).foreach { c => tightenLo(c, v); tightenHi(c, v) }
      // literal-first spellings
      case GreaterThanOrEqual(Literal(v, _), a) =>
        skip(a).foreach(tightenHi(_, v))
      case GreaterThan(Literal(v, _), a) =>
        skip(a).foreach(tightenHi(_, v))
      case LessThanOrEqual(Literal(v, _), a) =>
        skip(a).foreach(tightenLo(_, v))
      case LessThan(Literal(v, _), a) =>
        skip(a).foreach(tightenLo(_, v))
      case EqualTo(Literal(v, _), a) =>
        skip(a).foreach { c => tightenLo(c, v); tightenHi(c, v) }
      case _ => ()
    }
    dataFilters.foreach(visit)

    val selected: Array[FileStatus] =
      if (lo.isEmpty && hi.isEmpty && loL.isEmpty && hiL.isEmpty)
        snapStatuses.toArray
      else {
        val zoned = snapZones.flatMap { z =>
          val admits = skipCols.forall { case (col, (minF, maxF)) =>
            val zmin = z.getAs[Double](minF)
            val zmax = z.getAs[Double](maxF)
            lo.get(col).forall(zmax >= _) && hi.get(col).forall(zmin <= _)
          } && longCols.forall { case (col, (minF, maxF)) =>
            val zmin = z.getAs[Long](minF)
            val zmax = z.getAs[Long](maxF)
            loL.get(col).forall(zmax >= _) && hiL.get(col).forall(zmin <= _)
          }
          if (admits) snapByPath.get(z.getAs[String]("file")) else None
        }
        // files without a zone row are never silently dropped
        val zonedKeys = snapZones.map(_.getAs[String]("file")).toSet
        zoned ++ snapStatuses.filterNot(s => zonedKeys.contains(s.getPath.toString))
      }
    Seq(PartitionDirectory(InternalRow.empty, selected))
  }
}

object ZoneMapFileIndex {
  /** Wrap a z-ordered parquet layout as a DataFrame whose scan prunes
    * files through the footer zone map at PLANNING time. `zones` rows are
    * [[graft.operators.ZoneMap]]'s footer rows (file, pmin, pmax, qmin,
    * qmax, n_rows); `zonesFor` derives the same rows for files appended
    * after construction (driven by [[ZoneMapFileIndex.refresh]]). */
  def table(spark: SparkSession, layout: String, zones: Array[Row],
      schema: StructType, skipCols: Map[String, (String, String)],
      zonesFor: Seq[Path] => Array[Row],
      longCols: Map[String, (String, String)] = Map.empty): DataFrame = {
    val rootPath = new Path(layout)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = fs.listStatus(rootPath).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
    val index = new ZoneMapFileIndex(rootPath, zones, statuses, skipCols,
      spark.sparkContext.hadoopConfiguration, zonesFor, longCols)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(relation)
  }
}
