package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.CciPipeline

object ScratchCci {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.getOrCreate()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("warmup range")(noop(spark.range(1000).toDF("x")))
    t("events scan")(noop(graft.sources.Tables.events(spark, dir)))
    t("bars")(noop(CciPipeline.ohlcBars(spark, dir)))
    t("bars again")(noop(CciPipeline.ohlcBars(spark, dir)))
    t("cci cold (persists)")(noop(CciPipeline.cci(spark, dir)))
    t("cci warm")(noop(CciPipeline.cci(spark, dir)))
    t("signals (cci warm)")(noop(CciPipeline.signalsQuery(spark, dir)))
    t("trades cold (persists)")(noop(CciPipeline.trades(spark, dir)))
    t("trades warm")(noop(CciPipeline.trades(spark, dir)))
    t("strategyAgg cold")(noop(CciPipeline.strategyAgg(spark, dir)))
    t("strategyAgg warm")(noop(CciPipeline.strategyAgg(spark, dir)))
    spark.stop()
  }
}
