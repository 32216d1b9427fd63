package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** One-off stage attribution for s02's LSH geometry at scaled corpora
  * (round-15 sf100 rehearsal): run s02 under a planes override and print
  * per-stage (wall, tasks, input/shuffle volume) so a slow geometry can
  * be blamed on a STAGE, not guessed at. Usage:
  * `SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 runMain graft.tools.S02Probe 8 12` */
object S02Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val planesList = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(8, 12)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.put(si.stageId,
          f"stage ${si.stageId}%4d ${si.name.take(60)}%-60s tasks=${si.numTasks}%4d " +
          f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%8.1fs " +
          f"inRec=${m.inputMetrics.recordsRead}%12d shRead=${m.shuffleReadMetrics.recordsRead}%12d " +
          f"shWrite=${m.shuffleWriteMetrics.recordsWritten}%12d spill=${m.diskBytesSpilled / (1L << 20)}%6dMB"): Unit
      }
    })
    for (p <- planesList) {
      stages.clear()
      val t0 = System.nanoTime()
      graft.similarity.Similarity.lshTopKParam(spark, dir, p, 2)
        .write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"== planes=$p total=$w%.1fs")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_._1).foreach { case (_, s) => println(s) }
    }
    spark.stop()
  }
}
