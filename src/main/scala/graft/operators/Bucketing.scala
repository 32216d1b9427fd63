package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketed-table co-location (SURVEY.md §5): persist both join sides
  * bucketed on the join key so repeated joins read co-located buckets and
  * plan with NO shuffle exchange — the prepared-layout answer for a fact
  * table that is joined on the same key daily at 100 TB.
  *
  * Demonstrated against a local warehouse; the plan property (no
  * ShuffleExchange between the scans and the join) is asserted in tests.
  */
object Bucketing {
  /** Write lineitem + orders bucketed by the order key and join them from
    * the bucketed layout. Returns the joined aggregate. */
  def bucketedJoin(spark: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_buckets")
    // Idempotent rewrite: drop metadata AND stale locations (a crashed run
    // can leave the directory without the table entry).
    Seq("lineitem_b", "orders_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_buckets.$t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        s"graft_buckets.db/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Tables.lineitem(spark, dir)
      .write.mode("overwrite")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_buckets.lineitem_b")
    Tables.orders(spark, dir)
      .write.mode("overwrite")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_buckets.orders_b")
    val li = spark.table("graft_buckets.lineitem_b")
    val o = spark.table("graft_buckets.orders_b")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        (sum(floor($"l_extendedprice" * 100.0 + 0.5).cast("long")).cast("double") / 100.0).as("total_price"))
      .orderBy($"o_orderstatus")
  }

  /** True when the physical plan of the bucketed sort-merge join contains
    * no shuffle exchange (the whole point of the bucketed layout).
    * Broadcast is disabled for the check — at test SF the planner would
    * otherwise broadcast the small side and ignore the buckets, which is
    * exactly what it should pick there; the bucketed path is the 100 TB
    * shape where neither side broadcasts. */
  def joinIsExchangeFree(spark: SparkSession): Boolean = {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = spark.table("graft_buckets.lineitem_b")
      val o = spark.table("graft_buckets.orders_b")
      val plan = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .queryExecution.executedPlan.toString
      !plan.contains("Exchange hashpartitioning")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
