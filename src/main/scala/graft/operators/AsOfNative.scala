package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.AsOf
import graft.sources.Tables

/** q47: the q22 as-of semantics through the NATIVE operator
  * ([[graft.plans.AsOfJoinExec]]), carrying the matched row's PAYLOAD —
  * the thing the window composition structurally cannot do in one pass.
  *
  * Each purchase is joined to the same user's most recent prior-or-equal
  * view, and the output keeps the view's event_id AND value alongside the
  * purchase. q22's `max(when(view, ts)) over (...)` recovers only the
  * matched timestamp; getting the payload back would cost an extra
  * equi-join on (user_id, ts). Here: two key-partitioned exchanges, two
  * in-partition sorts, one merge pass.
  *
  * The right side is deduped to one view per (user_id, ts) — keep the
  * max event_id, a total order — because "latest <= t" is only
  * deterministic when (key, time) is unique, the same contract DuckDB's
  * ASOF JOIN carries (its oracle side picks an arbitrary row among exact
  * time ties otherwise).
  */
object AsOfNative {

  def q47AsofNative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"),
        $"value".as("purchase_value"))
    val views = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts")
      .agg(max(struct($"event_id", $"value")).as("m"))
      .select($"user_id".as("v_user_id"), $"ts".as("view_ts"),
        $"m.event_id".as("view_id"), $"m.value".as("view_value"))
    AsOf.join(purchases, views,
        on = Seq("user_id" -> "v_user_id"),
        leftTime = "purchase_ts", rightTime = "view_ts")
      .select($"user_id", $"purchase_id", $"purchase_ts", $"purchase_value",
        $"view_id", $"view_ts", $"view_value",
        (unix_micros($"purchase_ts") - unix_micros($"view_ts"))
          .as("view_to_purchase_us"))
      .orderBy($"user_id", $"purchase_id")
  }

  val q47Sql: String =
    Tables.eventsOracleCte + ",\n" +
      """purchases AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
        |         value AS purchase_value
        |  FROM events_us WHERE event_type = 'purchase'),
        |views AS (
        |  SELECT user_id AS v_user_id, ts AS view_ts,
        |         max(event_id) AS view_id, arg_max(value, event_id) AS view_value
        |  FROM events_us WHERE event_type = 'view'
        |  GROUP BY 1, 2)
        |SELECT p.user_id, p.purchase_id, p.purchase_ts, p.purchase_value,
        |       v.view_id, v.view_ts, v.view_value,
        |       epoch_us(p.purchase_ts) - epoch_us(v.view_ts) AS view_to_purchase_us
        |FROM purchases p
        |ASOF LEFT JOIN views v
        |  ON p.user_id = v.v_user_id AND p.purchase_ts >= v.view_ts
        |ORDER BY p.user_id, p.purchase_id""".stripMargin
}
