package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** v09: streaming position ledger — the real-time counterpart of the batch
  * r26 ledger (graft.operators.CciPipeline.positionLedger). The reference
  * polls broker execution state during the trading day and updates its
  * balance incrementally (hankook_api.py:283 get_stock_balance,
  * daily_function.py:1632/1828 execution checks); here the fill feed is a
  * stream and per-account running holdings/cash live in keyed state.
  *
  * Scale shape: state is one (qty, cash) pair per account — O(accounts),
  * not O(fills) — and fills shuffle once on the account key per
  * micro-batch. Within a batch each group's fills apply in the batch
  * ledger's (event_date, order_no, side) order, so a single-batch replay
  * reproduces r26's running values exactly (asserted in the spec); across
  * batches the feed's arrival order stands in for event order, the same
  * contract an incremental broker poll gives the reference. */
object LedgerStream {
  final case class Fill(cust_id: Long, event_date: java.sql.Date,
      order_no: Long, side: String, qty_delta: Long, cash_delta: Long)
  final case class LedgerUpdate(cust_id: Long, event_date: java.sql.Date,
      order_no: Long, side: String, qty_delta: Long, cash_delta: Long,
      position_qty: Long, cash_balance: Long)
  /** Public: Spark's state encoder codegen needs constructor access. */
  final case class LedgerState(qty: Long, cash: Long)

  val fillSchema: StructType = StructType(Seq(
    StructField("cust_id", LongType), StructField("event_date", DateType),
    StructField("order_no", LongType), StructField("side", StringType),
    StructField("qty_delta", LongType), StructField("cash_delta", LongType)))

  def readFillStream(spark: SparkSession, streamDir: String): DataFrame =
    spark.readStream.schema(fillSchema).parquet(streamDir)

  def runningLedger(spark: SparkSession, streamDir: String): Dataset[LedgerUpdate] = {
    import spark.implicits._
    readFillStream(spark, streamDir).as[Fill]
      .groupByKey(_.cust_id)
      .flatMapGroupsWithState[LedgerState, LedgerUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (cust, rows, state: GroupState[LedgerState]) =>
          val sorted = rows.toSeq
            .sortBy(f => (f.event_date.getTime, f.order_no, f.side))
          var st = state.getOption.getOrElse(LedgerState(0L, 0L))
          val out = sorted.map { f =>
            st = LedgerState(st.qty + f.qty_delta, st.cash + f.cash_delta)
            LedgerUpdate(cust, f.event_date, f.order_no, f.side,
              f.qty_delta, f.cash_delta, st.qty, st.cash)
          }
          state.update(st)
          out.iterator
      }
  }
}
