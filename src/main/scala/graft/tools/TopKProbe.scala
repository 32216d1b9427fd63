package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** Ad-hoc probe behind the q46 numbers quoted in operators/TopK.scala and
  * PERF.md: wall time and total shuffle-write records/bytes for the native
  * graft_topk aggregate vs the WindowGroupLimit'd row_number() twin.
  * Run: `sbt "runMain graft.tools.TopKProbe"` (SPARK_GRAFT_SF_DIR to vary). */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val recs = new LongAdder; val bytes = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { recs.add(m.shuffleWriteMetrics.recordsWritten)
          bytes.add(m.shuffleWriteMetrics.bytesWritten) }
      }
    })
    def mat(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def measure(label: String)(df: => DataFrame): Unit = {
      Thread.sleep(600) // drain listener events from the previous action
      recs.reset(); bytes.reset()
      val t0 = System.nanoTime()
      mat(df)
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(600)
      println(f"$label: $secs%.3f s  shuffleRecords=${recs.sum} shuffleBytes=${bytes.sum}")
    }
    mat(graft.sources.Tables.events(spark, dir)) // warm the scan
    for (_ <- 1 to 2) {
      measure("agg   ")(graft.operators.TopK.q46TopkPergroup(spark, dir))
      measure("window")(graft.operators.TopK.windowTwin(spark, dir))
    }
    spark.stop()
  }
}
