package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Typed Dataset API coverage (SURVEY.md §3): case-class rows, groupByKey
  * and a custom Aggregator — the compile-time-checked face of the engine.
  * Cents are accumulated as exact integers so the result is deterministic
  * regardless of merge order. */
object Typed {

  /** Narrow projection of [[Lineitem]] for q18: the aggregate touches only
    * these three columns, and a typed boundary over the FULL case class would
    * force the scan to materialize every lineitem column. Projecting (and
    * filtering) with column expressions BEFORE `.as[LineSlim]` keeps the
    * quantity predicate in `PushedFilters` and the `ReadSchema` at three
    * columns — the deserializer then only ever sees the slim rows. */
  final case class LineSlim(l_returnflag: String, l_quantity: Double, l_extendedprice: Double)

  /** (count, qty_cents, price_cents) accumulator. */
  object LineStats extends Aggregator[LineSlim, (Long, Long, Long), (Long, Double, Double)] {
    override def zero: (Long, Long, Long) = (0L, 0L, 0L)
    private def cents(x: Double): Long = math.floor(x * 100.0 + 0.5).toLong
    override def reduce(b: (Long, Long, Long), l: LineSlim): (Long, Long, Long) =
      (b._1 + 1, b._2 + cents(l.l_quantity), b._3 + cents(l.l_extendedprice))
    override def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
      (a._1 + b._1, a._2 + b._2, a._3 + b._3)
    override def finish(r: (Long, Long, Long)): (Long, Double, Double) =
      (r._1, r._2.toDouble / 100.0, r._3.toDouble / 100.0)
    override def bufferEncoder: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[(Long, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
  }

  /** q18: column filter/project → typed boundary → groupByKey → custom
    * Aggregator. The filter and select are Column expressions (not typed
    * lambdas) so Catalyst pushes the predicate to the parquet scan and prunes
    * the read schema to the three live columns; only then do rows cross into
    * the typed world. */
  def typedStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_quantity" > 10.0)
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      .as[LineSlim]
      .groupByKey(_.l_returnflag)
      .agg(LineStats.toColumn.name("stats"))
      .select($"key".as("l_returnflag"),
        $"stats._1".as("n"),
        $"stats._2".as("total_qty"),
        $"stats._3".as("total_price"))
      .orderBy($"l_returnflag")
  }

  val typedStatsSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
      |FROM lineitem
      |WHERE l_quantity > 10.0
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** a01: sketch aggregates — HLL distinct + approximate percentiles.
    * Approximation schemes differ across engines, so the driver applies
    * the rows-only check (no SQL oracle); exactness is cross-checked in
    * tests against the exact operators at small SF. */
  def approxSketches(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey").as("approx_parts"),
        approx_count_distinct($"l_orderkey").as("approx_orders"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("approx_median_price"))
      .orderBy($"l_returnflag")
  }
}
