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
  * the affected files stay in the listing. A file with no zone row (e.g.
  * appended after index construction — callers rebuild via refresh())
  * also stays. Soundness: a file is dropped ONLY when its zone cannot
  * intersect bounds implied by predicates the scan itself still applies.
  *
  * At 100 TB the index holds one (file, zones) row per file — the same
  * file-count-scale metadata the operator path memoizes — and listing is
  * a driver-side filter over it: zero data reads, zero Spark jobs.
  */
final class ZoneMapFileIndex(
    root: Path,
    zones: Array[Row],
    statuses: Seq[FileStatus],
    /** skip column name -> (zone min field, zone max field) */
    skipCols: Map[String, (String, String)]) extends FileIndex {

  private val byPath: Map[String, FileStatus] =
    statuses.map(s => s.getPath.toString -> s).toMap

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = StructType(Nil)
  override def inputFiles: Array[String] = statuses.map(_.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_.getLen).sum

  private def asDouble(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case i: Int => Some(i.toDouble)
    case l: Long => Some(l.toDouble)
    case s: Short => Some(s.toDouble)
    case b: Byte => Some(b.toDouble)
    case d: Decimal => Some(d.toDouble)
    case _ => None
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // conservative per-column bounds from the recognizable conjuncts
    val lo = collection.mutable.Map.empty[String, Double]
    val hi = collection.mutable.Map.empty[String, Double]
    def tightenLo(c: String, v: Double): Unit =
      lo.updateWith(c)(p => Some(p.fold(v)(math.max(_, v)))): Unit
    def tightenHi(c: String, v: Double): Unit =
      hi.updateWith(c)(p => Some(p.fold(v)(math.min(_, v)))): Unit
    def skip(a: Expression): Option[String] = a match {
      case ar: AttributeReference if skipCols.contains(ar.name) => Some(ar.name)
      case _ => None
    }
    def visit(e: Expression): Unit = e match {
      case And(l, r) => visit(l); visit(r)
      case GreaterThanOrEqual(a, Literal(v, _)) =>
        skip(a).foreach(c => asDouble(v).foreach(tightenLo(c, _)))
      case GreaterThan(a, Literal(v, _)) =>
        skip(a).foreach(c => asDouble(v).foreach(tightenLo(c, _)))
      case LessThanOrEqual(a, Literal(v, _)) =>
        skip(a).foreach(c => asDouble(v).foreach(tightenHi(c, _)))
      case LessThan(a, Literal(v, _)) =>
        skip(a).foreach(c => asDouble(v).foreach(tightenHi(c, _)))
      case EqualTo(a, Literal(v, _)) =>
        skip(a).foreach(c => asDouble(v).foreach { d =>
          tightenLo(c, d); tightenHi(c, d) })
      // literal-first spellings
      case GreaterThanOrEqual(Literal(v, _), a) =>
        skip(a).foreach(c => asDouble(v).foreach(tightenHi(c, _)))
      case GreaterThan(Literal(v, _), a) =>
        skip(a).foreach(c => asDouble(v).foreach(tightenHi(c, _)))
      case LessThanOrEqual(Literal(v, _), a) =>
        skip(a).foreach(c => asDouble(v).foreach(tightenLo(c, _)))
      case LessThan(Literal(v, _), a) =>
        skip(a).foreach(c => asDouble(v).foreach(tightenLo(c, _)))
      case EqualTo(Literal(v, _), a) =>
        skip(a).foreach(c => asDouble(v).foreach { d =>
          tightenLo(c, d); tightenHi(c, d) })
      case _ => ()
    }
    dataFilters.foreach(visit)

    val selected: Array[FileStatus] =
      if (lo.isEmpty && hi.isEmpty) statuses.toArray
      else {
        val zoned = zones.flatMap { z =>
          val admits = skipCols.forall { case (col, (minF, maxF)) =>
            val zmin = z.getAs[Double](minF)
            val zmax = z.getAs[Double](maxF)
            lo.get(col).forall(zmax >= _) && hi.get(col).forall(zmin <= _)
          }
          if (admits) byPath.get(z.getAs[String]("file")) else None
        }
        // files without a zone row are never silently dropped
        val zonedKeys = zones.map(_.getAs[String]("file")).toSet
        zoned ++ statuses.filterNot(s => zonedKeys.contains(s.getPath.toString))
      }
    Seq(PartitionDirectory(InternalRow.empty, selected))
  }
}

object ZoneMapFileIndex {
  /** Wrap a z-ordered parquet layout as a DataFrame whose scan prunes
    * files through the footer zone map at PLANNING time. `zones` rows are
    * [[graft.operators.ZoneMap]]'s footer rows (file, pmin, pmax, qmin,
    * qmax, n_rows). */
  def table(spark: SparkSession, layout: String, zones: Array[Row],
      schema: StructType, skipCols: Map[String, (String, String)]): DataFrame = {
    val rootPath = new Path(layout)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = fs.listStatus(rootPath).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
    val index = new ZoneMapFileIndex(rootPath, zones, statuses, skipCols)
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
