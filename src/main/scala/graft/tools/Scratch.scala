package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => F}
import graft.sources.Tables

/** Ad-hoc profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.getOrCreate()
    import spark.implicits._
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, dir)
    t("scan only")(noop(docs))
    t("tokens")(noop(docs.select($"doc_id", F.tokens($"text").as("tk"))))
    t("shingles")(noop(docs.select($"doc_id", F.tokens($"text").as("tk"))
      .select($"doc_id", F.shingles3($"tk").as("shs"))))
    t("polyhash text")(noop(docs.select($"doc_id", F.polyHash($"text").as("fp"))))
    t("shingle hashes")(noop(docs.select($"doc_id", F.tokens($"text").as("tk"))
      .select($"doc_id", F.shingles3($"tk").as("shs"))
      .select($"doc_id", transform($"shs", sh => F.polyHash(sh)).as("hs"))))
    t("min shingle hash")(noop(docs.select($"doc_id", F.tokens($"text").as("tk"))
      .select($"doc_id", F.shingles3($"tk").as("shs"))
      .select($"doc_id", array_min(transform($"shs", sh => F.polyHash(sh))).as("m"))))
    import graft.dedup.Dedup
    t("d02 warm-up")(noop(Dedup.ngramJaccard(spark, dir)))
    // phase-by-phase replica of dedupClusters
    t("pairs checkpoint")({
      val p = graft.GraftSession.maybeEagerCheckpoint(
        Dedup.jaccardPairsFrom(docs, Dedup.MaxShingleDf)
          .filter($"jaccard" >= Dedup.JaccardThreshold)
          .select($"doc_a", $"doc_b"))
      ()
    })
    t("d07 full")(noop(Dedup.dedupClusters(spark, dir)))
    t("d07 again")(noop(Dedup.dedupClusters(spark, dir)))
    def base = docs
      .select($"doc_id", $"text", F.tokens($"text").as("tk"))
      .select($"doc_id", F.polyHash($"text").as("fingerprint"), F.shingles3($"tk").as("shs"))
    t("base (fp+shs)")(noop(base))
    t("base+filter")(noop(base.filter(size($"shs") > 0)))
    t("base+filter+min")(noop(base.filter(size($"shs") > 0)
      .withColumn("min_shingle_hash", array_min(transform($"shs", sh => F.polyHash(sh))))
      .select($"doc_id", $"fingerprint", $"min_shingle_hash")))
    t("t04 full (=+orderBy)")(noop(graft.operators.TextAnalysis.fingerprint(spark, dir)))
    t("t04 again")(noop(graft.operators.TextAnalysis.fingerprint(spark, dir)))
    spark.stop()
  }
}
