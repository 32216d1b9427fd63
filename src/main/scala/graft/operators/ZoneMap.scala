package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** File-level zone-map data skipping — min/max statistics pruning on a
  * NON-partition column (the Delta/Iceberg data-skipping primitive,
  * expressed with plain parquet + a metadata table).
  *
  * Partition pruning (r16/r19) answers predicates on the partition column
  * only. A range predicate on an ordinary column still scans every file —
  * unless the layout is value-CLUSTERED and a per-file [min, max] "zone
  * map" lets the planner drop files whose range cannot intersect the
  * predicate. Two pieces:
  *
  *   1. CLUSTER-THEN-SKIP layout: `repartitionByRange` on the skip column
  *      before the write gives each file a narrow, near-disjoint value
  *      range (the 1-D special case of Z-ordering). Skipping only bites
  *      when values are clustered — a random layout's zones all span the
  *      full domain.
  *   2. The zone map itself is ONE partial-aggregable scan grouped on
  *      `_metadata.file_path` → (file, min, max, rows): a metadata-scale
  *      table (one row per FILE — at 100 TB with 1 GiB files that is
  *      ~10^5 rows, a dimension). In production it is maintained
  *      incrementally at write time (each new file appends its own row);
  *      rebuilding here keeps the operator self-contained.
  *
  * A range query then: (a) filters the zone map on the driver (a
  * file-count-scale metadata op, the same class as r19's max-partition
  * listing), (b) reads ONLY the overlapping files, with the residual
  * predicate still pushed to those scans (zones overlap at file
  * boundaries, so the filter stays — skipping is an optimization, never a
  * semantics change). The construction asserts the skip actually bit:
  * strictly fewer files read than the layout holds.
  *
  * The DuckDB oracle runs the same predicate over the ORIGINAL unclustered
  * table, so the gate proves pruned-read ≡ full-scan semantics.
  */
object ZoneMap {
  /** Files in the clustered layout; at sf0.01 each covers ~1/16 of the
    * price quantile range, so the band predicate touches 1–3 of them. */
  val ZoneFiles = 16
  /** The range predicate (inclusive both ends, ~6% of the value domain). */
  val PriceLo = 30000.0
  val PriceHi = 36000.0

  /** Clustered layout per source dir, built once per JVM (the bench sweep
    * and the verify gate both call the query; the layout is immutable
    * derived state, same memoization discipline as the ANN index
    * workspace). Shutdown-hook cleaned via Extras.tempDir. */
  private[graft] val layouts = scala.collection.concurrent.TrieMap.empty[String, String]

  private def clusteredLayout(spark: SparkSession, dir: String): String =
    layouts.getOrElseUpdate(dir, {
      val out = Extras.tempDir("graft_zonemap")
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .repartitionByRange(ZoneFiles, col("l_extendedprice"))
        .write.mode("overwrite").parquet(out)
      out
    })

  /** The zone-map metadata table: one row per file with the skip column's
    * [min, max] and the row count. One partial-aggregable scan. */
  def zoneMap(spark: SparkSession, layout: String): DataFrame =
    spark.read.parquet(layout)
      .select(col("_metadata.file_path").as("file"), col("l_extendedprice"))
      .groupBy(col("file"))
      .agg(min(col("l_extendedprice")).as("zmin"),
        max(col("l_extendedprice")).as("zmax"),
        count(lit(1)).as("n_rows"))

  /** The files whose zones intersect [lo, hi], and the layout's total file
    * count — a driver-side metadata op over the file-scale zone map. */
  private[graft] def planSkip(spark: SparkSession, layout: String,
      lo: Double, hi: Double): (Seq[String], Int) = {
    val zones = zoneMap(spark, layout).collect()
    val matched = zones.filter { r =>
      r.getAs[Double]("zmax") >= lo && r.getAs[Double]("zmin") <= hi
    }.map(_.getAs[String]("file")).toSeq.sorted
    (matched, zones.length)
  }

  // ---------------------------------------------------------------- r40
  /** Range-band revenue summary answered through the zone map: read only
    * the files whose zones intersect the predicate, keep the residual
    * filter (pushed to the pruned scans), aggregate per return flag in
    * exact integer cents. */
  def zonemapSkip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val layout = clusteredLayout(spark, dir)
    val (files, total) = planSkip(spark, layout, PriceLo, PriceHi)
    require(files.nonEmpty, "zone map matched no file for a non-empty band")
    require(files.length < total,
      s"zone map failed to skip: ${files.length} of $total files matched " +
        s"[$PriceLo, $PriceHi] — layout not clustered?")
    spark.read.parquet(files: _*)
      .filter($"l_extendedprice" >= PriceLo && $"l_extendedprice" <= PriceHi)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        (sum(graft.functions.Money.cents($"l_quantity")).cast("double") / 100.0)
          .as("sum_qty"),
        (sum(graft.functions.Money.cents($"l_extendedprice")).cast("double") / 100.0)
          .as("sum_price"))
      .orderBy($"l_returnflag")
  }

  val zonemapSkipSql: String =
    s"""SELECT l_returnflag, count(*) AS n_lines,
       |  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
       |  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
       |FROM lineitem
       |WHERE l_extendedprice BETWEEN $PriceLo AND $PriceHi
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
