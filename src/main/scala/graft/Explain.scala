package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- sys.env.get("GRAFT_EXPLAIN").map(_.split(",").toSeq).getOrElse(Seq("q02_filter_project"))) {
      println(s"===== $q")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
