package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation (SURVEY.md §2 p03): the composition
  * a real LLM-data pipeline runs before tokenization — quality scoring,
  * minimum-length gating, and near-dup cluster canonicalization in one
  * pass over the documents table.
  *
  * Composes t02 (quality columns) with d07 (connected-component dedup
  * clusters): a document survives iff it is its cluster's canonical
  * representative AND its blended quality score clears [[MinQuality]] AND
  * it has at least [[MinTokens]] tokens. Scale shape: both inputs shuffle
  * on doc_id for the join; the cluster side is O(near-dup docs) plus the
  * singleton union, the quality side is a pure map over the scan. */
object Curation {
  val MinQuality = 0.40
  val MinTokens = 5

  // ---------------------------------------------------------------- p03
  def curatedCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val quality = TextAnalysis.qualityScore(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_tokens", $"quality_score")
    val canon = graft.dedup.Dedup.dedupClusters(spark, dir)
      .select($"doc_id", $"cluster_size", $"is_canonical")
    quality
      .join(canon, Seq("doc_id"))
      .filter($"is_canonical" && $"quality_score" >= MinQuality &&
        $"n_tokens" >= MinTokens)
      .select($"doc_id", $"lang", $"source", $"n_tokens",
        $"quality_score", $"cluster_size")
      .orderBy($"doc_id")
  }

  val curatedCorpusSql: String =
    graft.dedup.Dedup.clusterCtes + ",\n" +
      "qual AS (\n" + TextAnalysis.qualityCoreSql + ")\n" +
      s"""SELECT q.doc_id, q.lang, q.source, q.n_tokens,
         |  q.quality_score, c.cluster_size
         |FROM qual q JOIN clus c USING (doc_id)
         |WHERE c.is_canonical AND q.quality_score >= $MinQuality
         |  AND q.n_tokens >= $MinTokens
         |ORDER BY q.doc_id""".stripMargin
}
