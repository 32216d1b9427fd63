package graft

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.sources.v2.{ApiOrder, GraftOrderBatchWrite, GraftOrderSink, GraftOrderWriterFactory, InMemoryOrderBroker}

/** The order sink's exactly-once protocol (r43's machinery). The DSv2
  * write contract is exercised BOTH through real Spark jobs (staging
  * faults, partition spread, keep-last upsert) and at the protocol level
  * directly (an abandoned zombie attempt's staging id is never named in a
  * commit message, so its rows never publish — the case a job-level test
  * can't reach deterministically under local[4]'s no-task-retry config). */
class OrderSinkSpec extends AnyFunSuite {
  import TestSpark._
  import TestSpark.spark.implicits._

  private var n = 0
  private def freshBroker(failEveryNthStage: Int = 0, ackLossEveryNthStage: Int = 0)
      : (String, InMemoryOrderBroker.State, InMemoryOrderBroker) = {
    n += 1
    val id = s"order-spec-$n"
    val st = InMemoryOrderBroker.ensure(id)
    val api = new InMemoryOrderBroker(id, failEveryNthStage, ackLossEveryNthStage)
    GraftOrderSink.registerApi(id, api)
    (id, st, api)
  }

  private def ordersDf(qtyBase: Long, m: Int = 20) =
    (1 to m).map(i => (s"ORD-$i", i.toLong, "buy", qtyBase + i % 3,
      i * 1.25, java.sql.Date.valueOf("2024-03-01")))
      .toDF("order_no", "user_id", "side", "qty", "price", "d")

  private def book(api: InMemoryOrderBroker): Map[String, ApiOrder] =
    api.ledger(api.issueToken()).map(o => o.order_no -> o).toMap

  test("a written frame lands in the broker's book exactly, across partitions") {
    val (id, _, api) = freshBroker()
    ordersDf(10L).repartition(4).write.format("graft-orders")
      .option("api", id).option("pageSize", 3).option("backoffMs", 1)
      .mode("append").save()
    val b = book(api)
    assert(b.size == 20)
    assert(b("ORD-7") == ApiOrder("ORD-7", 7L, "buy", 10L + 7 % 3, 8.75,
      java.sql.Date.valueOf("2024-03-01").toLocalDate.toEpochDay.toInt))
  }

  test("transient staging 5xx retries the page — the book still lands complete") {
    val (id, st, api) = freshBroker(failEveryNthStage = 4)
    ordersDf(10L).repartition(3).write.format("graft-orders")
      .option("api", id).option("pageSize", 2).option("backoffMs", 1)
      .mode("append").save()
    assert(book(api).size == 20)
    assert(st.stageCalls.get() > 10, "fault injection never fired") // 10 pages + retries
  }

  test("lost staging ACK: the retried page replaces, never double-stages") {
    // the broker ACCEPTS every 3rd page, then drops the ack — the writer
    // must retry, and the (stagingId, pageSeq) key must make that retry
    // idempotent: 20 orders exactly once in the book, zero duplicates
    val (id, st, api) = freshBroker(ackLossEveryNthStage = 3)
    ordersDf(10L).repartition(2).write.format("graft-orders")
      .option("api", id).option("pageSize", 2).option("backoffMs", 1)
      .mode("append").save()
    assert(st.ackLosses.get() > 0, "ack-loss injection never fired")
    val all = api.ledger(api.issueToken())
    assert(all.size == 20, s"expected 20 placed orders, got ${all.size}")
    // the book's keep-last would MASK a double-staged page (same
    // order_no overwrites) — the accepted count would not: append-form
    // staging re-publishes the duplicated rows and counts past 20
    assert(st.acceptedTotal.get() == 20,
      s"double-staged rows published: accepted = ${st.acceptedTotal.get()}")
    assert(book(api)("ORD-7").qty == 10L + 7 % 3)
  }

  test("re-placing amended orders keeps the LAST values per order_no") {
    val (id, _, api) = freshBroker()
    def place(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("graft-orders").option("api", id)
        .option("backoffMs", 1).mode("append").save()
    place(ordersDf(10L))
    place(ordersDf(100L, m = 5)) // amend the first five
    val b = book(api)
    assert(b.size == 20)
    assert(b("ORD-3").qty == 100L + 3 % 3)
    assert(b("ORD-9").qty == 10L + 9 % 3)
  }

  test("protocol: an abandoned zombie attempt's rows are never published") {
    val (id, st, api) = freshBroker()
    val schema = GraftOrderSink.OrderSchema
    def row(no: String, qty: Long) = new GenericInternalRow(Array[Any](
      UTF8String.fromString(no), 1L, UTF8String.fromString("buy"), qty,
      9.5, 19783))
    val factory = new GraftOrderWriterFactory(api, "qZ", schema, 2, 3, 1L)
    // attempt 1: writes (and stages) rows, then is LOST — no commit, and a
    // zombie gets no abort either; its staging id is simply never named
    val zombie = factory.createWriter(0, 1L)
    zombie.write(row("ORD-A", 1L)); zombie.write(row("ORD-B", 1L))
    zombie.write(row("ORD-C", 1L)) // page of 2 staged, 1 buffered
    // attempt 2 (the retry) writes the same partition and commits
    val retry = factory.createWriter(0, 2L)
    retry.write(row("ORD-A", 2L)); retry.write(row("ORD-B", 2L))
    retry.write(row("ORD-C", 2L))
    val msg = retry.commit()
    val bw = new GraftOrderBatchWrite(id, "qZ", schema, 2, 3, 1L)
    bw.commit(Array(msg))
    val b = book(api)
    assert(b.size == 3 && b.values.forall(_.qty == 2L),
      s"zombie rows leaked into the book: $b")
    // the zombie's staging is orphaned but harmless — and a re-publish of
    // the SAME commit messages is a no-op (restarted driver case)
    bw.commit(Array(msg))
    assert(book(api) == b)
    assert(st.staged.size() == 1, "expected exactly the zombie's orphaned staging")
  }

  test("protocol: job abort discards staged pages and publishes nothing") {
    val (id, st, api) = freshBroker()
    val schema = GraftOrderSink.OrderSchema
    val factory = new GraftOrderWriterFactory(api, "qA", schema, 2, 3, 1L)
    val w = factory.createWriter(0, 1L)
    w.write(new GenericInternalRow(Array[Any](UTF8String.fromString("ORD-X"),
      1L, UTF8String.fromString("buy"), 1L, 9.5, 19783)))
    val msg = w.commit()
    new GraftOrderBatchWrite(id, "qA", schema, 2, 3, 1L).abort(Array(msg))
    assert(book(api).isEmpty)
    assert(st.staged.isEmpty, "abort left staged pages behind")
    assert(st.discardCalls.get() >= 1)
  }

  test("r43 gate face: the ledger equals the amended derivation from events") {
    val got = graft.sources.OrderSinkRoundtrip.orderSinkQuery(spark, sf)
    val want = Tables.events(spark, sf).filter($"event_type" === "purchase")
      .select(concat(lit("ORD-"), $"event_id").as("order_no"),
        (pmod($"event_id", lit(5L)) +
          when(pmod($"event_id", lit(7L)) === 0, 11L).otherwise(1L)).as("qty"))
    assert(got.count() == want.count() && got.count() > 0)
    val mismatch = got.select($"order_no", $"qty")
      .exceptAll(want.select($"order_no", $"qty")).count()
    assert(mismatch == 0)
  }
}
