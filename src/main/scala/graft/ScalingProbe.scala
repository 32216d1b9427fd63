package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the round-5 reshaped linear operators: replicate the
  * sf corpus N× (id-shifted), land it in parquet so scans are realistic,
  * and time d10 / d11 / p04 at each multiple. Linear wall-clock growth is
  * the evidence that no hidden super-linear term (pair space, single-task
  * materialization) survives — the 100-TB question asked at a scale this
  * box can answer. Run:
  * `SPARK_GRAFT_MULT=8 sbt "runMain graft.ScalingProbe"`; results are
  * recorded in PERF.md, not parsed by the driver. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text")
    val big = (0 until mult)
      .map(i => base.select(($"doc_id" + lit(i.toLong * 10000000L)).as("doc_id"), $"text"))
      .reduce(_ unionByName _)
    val dir = s"/tmp/graft_scale_probe_$mult"
    big.write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val n = docs.count()

    def timed(fn: => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val d10 = timed(graft.dedup.Dedup.normalizedDedupFrom(docs))
    val d11 = timed(graft.dedup.Dedup.spanDedupFrom(docs))
    val p04 = timed(graft.operators.Curation.sequencePackFrom(docs))
    println(f"""{"probe":"scale","mult":$mult,"docs":$n,"d10":$d10%.2f,"d11":$d11%.2f,"p04":$p04%.2f}""")
    spark.stop()
  }
}
