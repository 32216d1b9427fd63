package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q45 pointer-doubling hierarchy closure + t15 document chunking +
  * p12 manifest diff. */
class HierarchyChunkDiffSpec extends AnyFunSuite {
  import TestSpark._

  // ---------------------------------------------------------------- q45

  test("q45: doubling closure equals the walked parent chain for every node") {
    import spark.implicits._
    val keys = sources.Tables.part(spark, sf)
      .select($"p_partkey".cast("long")).as[Long].collect()
    val expect = keys.filter(_ >= 1L).flatMap { k =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var cur = k
      var d = 0L
      while (cur >= 1L) {
        val p = (cur - 1L) / 2L
        d += 1L
        out += ((k, p, d))
        cur = p
      }
      out
    }.toSet
    val got = operators.Hierarchy.hierarchyClosure(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == expect.size, "closure row count differs from the walk")
    assert(got.toSet == expect)
  }

  test("q45: every non-root node reaches the root exactly once") {
    import spark.implicits._
    val closure = operators.Hierarchy.hierarchyClosure(spark, sf)
    val n = sources.Tables.part(spark, sf).count()
    val rootPaths = closure.filter($"anc" === 0L).groupBy($"node")
      .agg(count(lit(1)).as("c"))
    assert(rootPaths.count() == n - 1, "every node except the root has a root path")
    assert(rootPaths.filter($"c" =!= 1L).count() == 0L, "tree paths are unique")
  }

  // ---------------------------------------------------------------- t15

  test("t15: chunks tile every document with the declared window/stride") {
    import spark.implicits._
    val W = operators.TextAnalysis.ChunkTokens
    val S = operators.TextAnalysis.ChunkStride
    val texts = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val byDoc = operators.TextAnalysis.docChunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .groupBy(_._1)
    assert(byDoc.keySet == texts.keySet, "every document emits at least one chunk")
    byDoc.foreach { case (docId, chunks) =>
      val tk = texts(docId).split(" ", -1)
      val n = tk.length
      assert(chunks.length == (n - 1) / S + 1, s"chunk count for doc $docId")
      chunks.sortBy(_._2).zipWithIndex.foreach { case ((_, ci, start, nTok, text), i) =>
        assert(ci == i.toLong)
        assert(start == i.toLong * S)
        val expect = tk.slice(i * S, math.min(i * S + W, n))
        assert(nTok == expect.length.toLong, s"chunk token count doc $docId ci $ci")
        assert(text == expect.mkString(" "), s"chunk text doc $docId ci $ci")
      }
    }
  }

  test("t15: plan is shuffle-free below the output sort") {
    val plan = operators.TextAnalysis.docChunk(spark, sf)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the only exchange is the range partitioning for the output orderBy
    assert(exchanges.size <= 1, s"expected at most the sort exchange, got ${exchanges.size}")
  }

  // ---------------------------------------------------------------- p12

  test("p12: the four statuses land exactly where the derivation puts them") {
    import spark.implicits._
    val diff = operators.Curation.manifestDiff(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2))).toMap
    val base = sources.Tables.documents(spark, sf)
      .select($"lang", $"source", $"doc_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val baseGroups = base.map(t => (t._1, t._2)).toSet
    // every dropped-source group reads as removed
    baseGroups.filter(_._2 == operators.Curation.DiffDropSource).foreach { g =>
      assert(diff(g) == "removed", s"$g")
    }
    // every ingest group is new in B
    diff.keys.filter(_._2 == operators.Curation.DiffIngestSource).foreach { g =>
      assert(diff(g) == "added", s"$g")
    }
    assert(diff.keys.exists(_._2 == operators.Curation.DiffIngestSource),
      "the ingest derivation must produce at least one added group")
    // a surviving group holding an edited doc is changed; one holding none is unchanged
    val edited = base.filter(t =>
      t._3 % operators.Curation.DiffEditDiv == operators.Curation.DiffEditMod)
      .map(t => (t._1, t._2)).toSet
    baseGroups.filterNot(_._2 == operators.Curation.DiffDropSource).foreach { g =>
      val expect = if (edited.contains(g)) "changed" else "unchanged"
      assert(diff(g) == expect, s"$g")
    }
    // and the verdict table covers exactly A-groups ∪ B-groups
    val ingestLangs = base.filter(
      _._3 % operators.Curation.DiffIngestDiv == operators.Curation.DiffIngestMod)
      .map(t => (t._1, operators.Curation.DiffIngestSource)).toSet
    assert(diff.keySet == baseGroups ++ ingestLangs)
  }

  test("p12: unchanged groups carry bit-identical fingerprints") {
    import spark.implicits._
    val rows = operators.Curation.manifestDiff(spark, sf)
      .filter($"status" === "unchanged").collect()
    assert(rows.nonEmpty, "corpus must hold at least one untouched group")
    rows.foreach { r =>
      assert(r.getAs[Long]("fp_a") == r.getAs[Long]("fp_b"))
      assert(r.getAs[Long]("docs_a") == r.getAs[Long]("docs_b"))
    }
  }
}
