package graft.sources.v2

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{ApiRetrySession, PagedEventApi, TransientApiError}

/** Wire-level order row (the broker's order-placement payload —
  * daily_function.py:1335/1828 place_order body). `d_days` is the order
  * date as epoch days (DateType's internal unit). */
final case class ApiOrder(order_no: String, user_id: Long, side: String,
    qty: Long, price: Double, d_days: Int)

/** The broker's order surface: STAGE pages under a task-attempt id,
  * PUBLISH staged attempts atomically, DISCARD abandoned ones — the
  * two-phase shape a non-transactional REST API needs for Spark's
  * commit protocol to deliver exactly-once placement. Idempotence rules
  * (what a real broker's order book gives you): re-publishing an
  * already-published staging id is a no-op; a re-published `order_no`
  * keeps the LAST accepted values (the reference's order-history upsert,
  * drop_duplicates(subset=[order_no], keep='last')). */
trait OrderApi extends Serializable {
  def issueToken(): String

  /** Stage one page under (stagingId, pageSeq). IDEMPOTENT per page:
    * a retried page whose first attempt succeeded server-side but whose
    * ack was lost (the exact failure mode the retry session exists for)
    * REPLACES its previous content instead of appending — without the
    * sequence key, that retry double-stages the page and breaks the
    * documented exactly-once placement. */
  def stagePage(token: String, stagingId: String, pageSeq: Int, page: Seq[ApiOrder]): Unit
  def publish(token: String, stagingIds: Seq[String]): Long
  def discard(token: String, stagingIds: Seq[String]): Unit
  /** The order-history endpoint: current accepted state, keep-last. */
  def ledger(token: String): Seq[ApiOrder]
}

/** In-process broker (registry pattern — [[ParquetBackedPagedApi]]'s
  * caveat applies): deterministic transient faults on staging for the
  * retry specs, call accounting the specs pin. */
final class InMemoryOrderBroker(id: String, failEveryNthStage: Int = 0,
    ackLossEveryNthStage: Int = 0) extends OrderApi {
  private def st = InMemoryOrderBroker.registry.get(id)

  override def issueToken(): String = s"$id-token"

  override def stagePage(token: String, stagingId: String, pageSeq: Int,
      page: Seq[ApiOrder]): Unit = {
    val s = st
    val n = s.stageCalls.incrementAndGet()
    // fault BEFORE the store: the page never reached the broker
    if (failEveryNthStage > 0 && n % failEveryNthStage == 0)
      throw new TransientApiError(s"staging endpoint 5xx (call $n)")
    // replace-by-seq: a retried page overwrites its own previous attempt
    s.staged.compute(stagingId, (_, old) =>
      (if (old == null) Map.empty[Int, Vector[ApiOrder]] else old)
        + (pageSeq -> Vector(page: _*))): Unit
    // fault AFTER the store: the broker accepted the page but the ACK was
    // lost — the client MUST retry, and the seq key makes that retry a
    // no-op instead of a duplicate (the scenario the append form missed)
    if (ackLossEveryNthStage > 0 && n % ackLossEveryNthStage == 0) {
      s.ackLosses.incrementAndGet()
      throw new TransientApiError(s"staging ack lost (call $n)")
    }
  }

  override def publish(token: String, stagingIds: Seq[String]): Long = {
    val s = st
    s.publishCalls.incrementAndGet()
    s.synchronized {
      var accepted = 0L
      stagingIds.foreach { sid =>
        if (!s.publishedStagings.contains(sid)) { // idempotent re-publish
          s.publishedStagings += sid
          s.staged.getOrDefault(sid, Map.empty[Int, Vector[ApiOrder]])
            .toSeq.sortBy(_._1).flatMap(_._2).foreach { o =>
              s.book.put(o.order_no, o) // keep-last per order_no
              accepted += 1
            }
          s.staged.remove(sid): Unit
        }
      }
      s.acceptedTotal.addAndGet(accepted)
      accepted
    }
  }

  override def discard(token: String, stagingIds: Seq[String]): Unit = {
    val s = st
    s.discardCalls.incrementAndGet()
    stagingIds.foreach(s.staged.remove(_): Unit)
  }

  override def ledger(token: String): Seq[ApiOrder] =
    st.synchronized { // snapshot under the book lock
      scala.jdk.CollectionConverters.CollectionHasAsScala(st.book.values())
        .asScala.toVector
    }
}

object InMemoryOrderBroker {
  final class State {
    val staged: ConcurrentHashMap[String, Map[Int, Vector[ApiOrder]]] = new ConcurrentHashMap
    var publishedStagings: Set[String] = Set.empty
    val book: java.util.LinkedHashMap[String, ApiOrder] = new java.util.LinkedHashMap
    val stageCalls = new AtomicLong
    val publishCalls = new AtomicLong
    val discardCalls = new AtomicLong
    val ackLosses = new AtomicLong
    val acceptedTotal = new AtomicLong
  }
  val registry: ConcurrentHashMap[String, State] = new ConcurrentHashMap
  def ensure(id: String): State =
    registry.computeIfAbsent(id, _ => new State)
}

/** `df.write.format("graft-orders")` — order placement as a DSv2 SINK.
  *
  * Spark's v2 write protocol maps onto the broker's two-phase surface:
  * each task's [[DataWriter]] STAGES its rows page by page under a
  * (queryId, partition, taskId) staging id through its own retry/backoff
  * session (a transient 5xx retries the page, not the task); the task's
  * `commit()` names that staging id in its [[WriterCommitMessage]]; the
  * DRIVER's [[BatchWrite.commit]] publishes exactly the named staging
  * ids in one call, and `abort` discards them. Exactly-once placement
  * falls out: an abandoned task attempt's staging id is never named, so
  * its rows are never published (the commit coordinator guarantees one
  * committed attempt per partition), and the broker's keep-last
  * `order_no` book absorbs whole-job republication. Options: `api`
  * (registry id in [[GraftOrderSink.apis]]), `pageSize`, `maxRetries`,
  * `backoffMs`. */
class GraftOrderSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-orders"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftOrderSink.OrderSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftOrderTable(properties.get("api"))
}

object GraftOrderSink {
  val OrderSchema: StructType = StructType(Seq(
    StructField("order_no", StringType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("side", StringType, nullable = false),
    StructField("qty", LongType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("d", DateType, nullable = false)))

  val apis: ConcurrentHashMap[String, OrderApi] = new ConcurrentHashMap
  def registerApi(id: String, api: OrderApi): Unit = apis.put(id, api)
  private[v2] def resolve(id: String): OrderApi = {
    val api = apis.get(id)
    require(api != null, s"graft-orders: no API registered under '$id'")
    api
  }
}

final class GraftOrderTable(apiId: String) extends Table with SupportsWrite {
  require(apiId != null, "graft-orders requires .option(\"api\", <registered id>)")
  override def name(): String = s"graft_orders($apiId)"
  override def schema(): StructType = GraftOrderSink.OrderSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // by-name field lookup: Spark resolves AppendData by name, but be
    // strict about the set so a wrong frame fails at plan time
    val got = info.schema().fieldNames.toSet
    val want = GraftOrderSink.OrderSchema.fieldNames.toSet
    require(got == want, s"graft-orders schema mismatch: got $got, want $want")
    val opts = info.options()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GraftOrderBatchWrite(apiId,
          info.queryId(), info.schema(),
          Option(opts.get("pageSize")).map(_.toInt).getOrElse(64),
          Option(opts.get("maxRetries")).map(_.toInt).getOrElse(5),
          Option(opts.get("backoffMs")).map(_.toLong).getOrElse(500L))
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new GraftOrderStreamingWrite(apiId, info.queryId(), info.schema(),
            Option(opts.get("pageSize")).map(_.toInt).getOrElse(64),
            Option(opts.get("maxRetries")).map(_.toInt).getOrElse(5),
            Option(opts.get("backoffMs")).map(_.toLong).getOrElse(500L))
      }
    }
  }
}

final case class GraftOrderCommitMessage(stagingId: String)
    extends WriterCommitMessage

final class GraftOrderBatchWrite(apiId: String, queryId: String,
    schema: StructType, pageSize: Int, maxRetries: Int, backoffMs: Long)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftOrderWriterFactory(GraftOrderSink.resolve(apiId), queryId,
      schema, pageSize, maxRetries, backoffMs)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ids = messages.map(_.asInstanceOf[GraftOrderCommitMessage].stagingId)
    new ApiRetrySession(orderApiShim, maxRetries, backoffMs)
      .call(t => GraftOrderSink.resolve(apiId).publish(t, ids.toSeq)): Unit
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val ids = messages.filter(_ != null)
      .map(_.asInstanceOf[GraftOrderCommitMessage].stagingId)
    new ApiRetrySession(orderApiShim, maxRetries, backoffMs)
      .call(t => GraftOrderSink.resolve(apiId).discard(t, ids.toSeq))
  }

  /** [[ApiRetrySession]] speaks [[PagedEventApi]] for token issue only;
    * adapt the order api's token endpoint into it so driver-side
    * publish/discard share the same bounded retry/backoff loop. */
  private def orderApiShim: PagedEventApi = new PagedEventApi {
    private val api = GraftOrderSink.resolve(apiId)
    override def issueToken(): String = api.issueToken()
    override def listKeys(token: String, asOf: java.sql.Date): Seq[Long] =
      throw new UnsupportedOperationException
    override def fetchPage(token: String, userId: Long, from: java.sql.Date,
        to: java.sql.Date, cursor: Option[String]): graft.sources.ApiPage =
      throw new UnsupportedOperationException
  }
}

/** The sink's streaming face (`writeStream.format("graft-orders")` — the
  * scheduler's 09:00/15:22 placement runs as a live feed consumer). Same
  * two-phase shape per EPOCH: staging ids carry (queryId, epoch,
  * partition, task), `commit(epochId, …)` publishes the epoch's named
  * attempts. A micro-batch REPLAY after a sink-commit (restart between
  * sink commit and offset commit — the classic at-least-once window)
  * re-stages under fresh ids and re-publishes the same `order_no`s; the
  * broker's keep-last book makes that replay content-idempotent, which
  * is exactly the reference's order-history upsert discipline. */
final class GraftOrderStreamingWrite(apiId: String, queryId: String,
    schema: StructType, pageSize: Int, maxRetries: Int, backoffMs: Long)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  private def delegate(epochId: Long) = new GraftOrderBatchWrite(apiId,
    s"$queryId/e$epochId", schema, pageSize, maxRetries, backoffMs)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new GraftOrderStreamingWriterFactory(GraftOrderSink.resolve(apiId),
      queryId, schema, pageSize, maxRetries, backoffMs)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    delegate(epochId).commit(messages)
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    delegate(epochId).abort(messages)
}

/** Top-level (not inner) so only the Serializable api handle ships. */
final class GraftOrderStreamingWriterFactory(api: OrderApi, queryId: String,
    schema: StructType, pageSize: Int, maxRetries: Int, backoffMs: Long)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftOrderDataWriter(api, s"$queryId/e$epochId/p$partitionId/t$taskId",
      schema, pageSize, maxRetries, backoffMs)
}

final class GraftOrderWriterFactory(api: OrderApi, queryId: String,
    schema: StructType, pageSize: Int, maxRetries: Int, backoffMs: Long)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftOrderDataWriter(api, s"$queryId/p$partitionId/t$taskId",
      schema, pageSize, maxRetries, backoffMs)
}

final class GraftOrderDataWriter(api: OrderApi, stagingId: String,
    schema: StructType, pageSize: Int, maxRetries: Int, backoffMs: Long)
    extends DataWriter[InternalRow] {
  private val idx = schema.fieldNames.zipWithIndex.toMap
  private val iOrderNo = idx("order_no"); private val iUser = idx("user_id")
  private val iSide = idx("side"); private val iQty = idx("qty")
  private val iPrice = idx("price"); private val iD = idx("d")
  private val buf = scala.collection.mutable.ArrayBuffer.empty[ApiOrder]
  private val session = new ApiRetrySession(new PagedEventApi {
    override def issueToken(): String = api.issueToken()
    override def listKeys(token: String, asOf: java.sql.Date): Seq[Long] =
      throw new UnsupportedOperationException
    override def fetchPage(token: String, userId: Long, from: java.sql.Date,
        to: java.sql.Date, cursor: Option[String]): graft.sources.ApiPage =
      throw new UnsupportedOperationException
  }, maxRetries, backoffMs)

  // monotonic page sequence: the retry closure captures ITS page's seq,
  // so a lost-ack retry re-stages the SAME (stagingId, seq) and the
  // broker's replace-by-seq keeps placement exactly-once
  private var nextSeq = 0
  private def flush(): Unit = if (buf.nonEmpty) {
    val page = buf.toVector
    val seq = nextSeq
    session.call(t => api.stagePage(t, stagingId, seq, page))
    nextSeq += 1
    buf.clear()
  }

  override def write(row: InternalRow): Unit = {
    buf += ApiOrder(row.getUTF8String(iOrderNo).toString, row.getLong(iUser),
      row.getUTF8String(iSide).toString, row.getLong(iQty),
      row.getDouble(iPrice), row.getInt(iD))
    if (buf.size >= pageSize) flush()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    GraftOrderCommitMessage(stagingId)
  }

  override def abort(): Unit =
    session.call(t => api.discard(t, Seq(stagingId)))

  override def close(): Unit = ()
}
