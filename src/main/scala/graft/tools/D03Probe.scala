package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc attribution probe for BENCH_SF1's d03 first-rep gap (VERDICT
  * r12 task 6): at sf1 d03's rep 1 was 55.2 s vs a 4.0 s min — expected
  * to be the shared doc-shingle cache build (the full bench's
  * `dedup_build` warm entry owns it; the SPARK_GRAFT_ONLY sweep skips
  * warm-ups, so rep 1 absorbs it). This separates the stages in one
  * fresh JVM: (a) the sharedShingles cache materialization alone, (b)
  * d03 cold-after-cache, (c) d03 warm — if (a) ≈ the 51 s gap and
  * (b) ≈ (c) ≈ the 4 s min, the attribution is the cache, not a
  * superlinear term in the LSH path.
  * Run: `sbt "runMain graft.tools.D03Probe [sfDir]"` (default
  * /tmp/graft_sf1, the MakeScaledSf output). */
object D03Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.GraftSession.builder(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(label: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.2f s")
      s
    }
    if (args.lift(1).contains("--cold-first")) {
      // the BENCH_SF1 ONLY-mode shape: d03 is the first query to touch
      // the shingle subtree, nothing pre-warmed
      val a = timed("d03 COLD-FIRST (no staged cache)")(
        graft.dedup.Dedup.minhashLsh(spark, dir))
      val b = timed("d03 warm")(graft.dedup.Dedup.minhashLsh(spark, dir))
      println(f"attribution: cold-first=$a%.2f s, warm=$b%.2f s")
    } else {
      val a = timed("dedup_build (sharedShingles)")(
        graft.dedup.Dedup.sharedShingles(spark, dir))
      val b = timed("d03 cold-after-cache")(
        graft.dedup.Dedup.minhashLsh(spark, dir))
      val c = timed("d03 warm")(graft.dedup.Dedup.minhashLsh(spark, dir))
      println(f"attribution: cache=$a%.2f s, d03 post-cache=$b%.2f/$c%.2f s")
    }
    spark.stop()
  }
}
