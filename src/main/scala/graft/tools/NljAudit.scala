package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** One-shot audit: every physical BroadcastNestedLoopJoin's BROADCAST
  * side, with its plan-stat row estimate — the question is whether any
  * broadcast side is corpus-scale (unbounded) rather than a 1-row
  * aggregate / literal grid / dimension. */
object NljAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        spark.catalog.clearCache()
        val plan = fn(spark, dir).queryExecution.executedPlan
        def walk(p: SparkPlan): Seq[BroadcastNestedLoopJoinExec] = {
          val self = p match {
            case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
            case b: BroadcastNestedLoopJoinExec => Seq(b)
            case _ => Seq.empty
          }
          self ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
        }
        walk(plan).foreach { b =>
          val side = if (b.buildSide.toString.contains("Left")) b.left else b.right
          val stats = side.logicalLink.map { l =>
            l.stats.rowCount.map(r => s"${r} rows")
              .getOrElse(s"${l.stats.sizeInBytes}B") }.getOrElse("?")
          println(s"[nlj] $name build=$stats head=${side.toString.linesIterator.next().take(80)}")
        }
      } catch { case e: Throwable => println(s"[nlj] $name ERR ${e.getClass.getSimpleName}") }
    }
    println("[nlj] done")
    spark.stop()
  }
}
