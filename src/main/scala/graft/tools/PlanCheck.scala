package graft.tools
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate()
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("r02_ohlc_bars", "r03_upsert_keep_last")) {
      val plan = graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      val hasWindow = plan.contains("Window")
      println(s"[plancheck] $q windowOp=$hasWindow exchanges=${plan.split("Exchange").length - 1}")
    }
    spark.stop()
  }
}
