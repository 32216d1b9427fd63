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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(fn: => Unit): Double =
      try { val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        // a failed query must stand out as -1, not masquerade as a timing
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }

    // SPARK_GRAFT_ONLY=q01,q03 limits the run (profiling); default = all.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // deterministic name order: numbers are comparable across runs (Map
    // hash order made warm-cache attribution depend on the run)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val warm =
      if (only.isEmpty)
        Seq("cache_build" -> timed("cache_build")(
          materialize(operators.CciPipeline.strategyAgg(spark, sfDir))))
      else Seq.empty
    val results = warm ++ selected.map { case (name, fn) =>
      name -> timed(name)(materialize(fn(spark, sfDir)))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
