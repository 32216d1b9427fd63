package graft.tools

/** Quick physical-plan audit for any registered query: exchange / window /
  * broadcast counts per operator. Usage:
  * `runMain graft.tools.PlanCheck q01_pricing_summary r26_position_ledger`
  * (no args = the keep-last/bars pair the round-3 rewrite watched). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val qs = if (args.nonEmpty) args.toSeq
             else Seq("r02_ohlc_bars", "r03_upsert_keep_last")
    for (q <- qs) {
      val plan = graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      println(s"[plancheck] $q " +
        s"exchanges=${plan.split("Exchange").length - 1} " +
        s"windows=${plan.split("\n").count(_.contains("Window"))} " +
        s"broadcasts=${plan.split("BroadcastExchange").length - 1}")
    }
    spark.stop()
  }
}
