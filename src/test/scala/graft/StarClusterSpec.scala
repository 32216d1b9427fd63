package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The d07b large-star/small-star core: same clusters as the propagation
  * core everywhere, and bounded rounds on the adversarial shape (one long
  * chain) that diameter-bound algorithms degrade on. */
class StarClusterSpec extends AnyFunSuite {
  import TestSpark._
  import TestSpark.spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_id", $"cluster_id", $"cluster_size", $"is_canonical")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet

  test("d07b: star core and propagation core agree exactly on the corpus") {
    val prop = rows(dedup.Dedup.dedupClusters(spark, sf))
    val stars = rows(dedup.Dedup.dedupClustersStars(spark, sf))
    assert(prop.nonEmpty)
    assert(stars == prop)
  }

  private def chainRounds(n: Int): Int = {
    val docs = (0L until n.toLong).toDF("doc_id")
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = dedup.Dedup.clustersFromPairsStars(docs, pairs)
    // one component rooted at 0: every doc labeled 0, only doc 0 canonical
    assert(got.filter($"cluster_id" =!= 0L || $"cluster_size" =!= n.toLong).count() == 0)
    assert(got.filter($"is_canonical").select($"doc_id").collect()
      .map(_.getLong(0)).toSeq == Seq(0L))
    assert(got.count() == n.toLong)
    dedup.Dedup.lastStarRounds.get()
  }

  test("d07b: a 10k-doc chain converges in logarithmic rounds with exact labels") {
    val r1k = chainRounds(1000)
    val r10k = chainRounds(10000)
    // diameter grew 10x (999 -> 9999); a diameter-bound walk would need
    // 10x the rounds — the star rules pay ~log, a few extra rounds
    // (observed 12 -> 15 class), and MaxCcRounds must stay comfortable
    assert(r10k <= dedup.Dedup.MaxCcRounds - 3, s"star rounds = $r10k on the 10k chain")
    assert(r10k - r1k <= 5, s"rounds grew $r1k -> $r10k on a 10x diameter")
  }

  test("d07b: disjoint components and singletons keep their identities") {
    val docs = (0L to 9L).toDF("doc_id")
    // {0,1,2} via a chain, {5,7} via one edge, rest singletons
    val pairs = Seq((2L, 1L), (1L, 0L), (7L, 5L)).toDF("doc_a", "doc_b")
    val got = rows(dedup.Dedup.clustersFromPairsStars(docs, pairs))
    assert(got == Set(
      (0L, 0L, 3L, true), (1L, 0L, 3L, false), (2L, 0L, 3L, false),
      (3L, 3L, 1L, true), (4L, 4L, 1L, true),
      (5L, 5L, 2L, true), (6L, 6L, 1L, true), (7L, 5L, 2L, false),
      (8L, 8L, 1L, true), (9L, 9L, 1L, true)))
  }

  test("d07b: empty pair set yields all-singleton clusters") {
    val docs = (0L to 4L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = rows(dedup.Dedup.clustersFromPairsStars(docs, pairs))
    assert(got == (0L to 4L).map(i => (i, i, 1L, true)).toSet)
  }
}
