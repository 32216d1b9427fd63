package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.TaskContext

import graft.sources.{ApiEventRow, ApiPage, PagedEventApi, TokenExpiredError, TransientApiError}

/** In-process fault-injecting stand-in for the broker REST API — the "server
  * side" the paged transport is exercised against. Deterministic faults (no
  * randomness): a page's FIRST attempt fails when its (key, page-ordinal)
  * hash lands on `failEveryNthPage`; tokens expire after `tokenTtlCalls`
  * uses; `poisonKey`'s pages always fail (retry-budget exhaustion path).
  *
  * Instances are serialized into task closures, so all shared state — the
  * dataset and the call-accounting the spec asserts on — lives in the
  * JVM-static [[FakePagedApi.registry]], keyed by the api id (local-mode
  * executors share the JVM; a real server would hold this state remotely). */
object FakePagedApi {
  final class Stats {
    val pageCalls = new AtomicLong
    val transientFailures = new AtomicLong
    val tokenExpiries = new AtomicLong
    val tokensIssued = new AtomicLong
    val driverPageCalls = new AtomicLong
    val partitionsSeen: ConcurrentHashMap[Int, java.lang.Boolean] = new ConcurrentHashMap
    val pageAttempts: ConcurrentHashMap[String, AtomicInteger] = new ConcurrentHashMap
    val tokenUses: ConcurrentHashMap[String, AtomicInteger] = new ConcurrentHashMap
  }
  val registry: ConcurrentHashMap[String, (Map[Long, Vector[ApiEventRow]], Stats)] =
    new ConcurrentHashMap

  def register(id: String, data: Map[Long, Vector[ApiEventRow]]): Stats = {
    val s = new Stats
    registry.put(id, (data, s))
    s
  }
  def stats(id: String): Stats = registry.get(id)._2
}

final class FakePagedApi(id: String, pageSize: Int,
    failEveryNthPage: Int = 0, tokenTtlCalls: Int = 0,
    poisonKey: Option[Long] = None,
    failFirstTokenIssues: Int = 0, // token ENDPOINT 5xx on the first N calls
    failFirstListKeys: Int = 0, // symbol-list ENDPOINT 5xx on the first N calls
    alwaysExpire: Boolean = false) // permanent 401: every page rejects its token
    extends PagedEventApi {

  private val listKeysCalls = new AtomicInteger

  private def entry = FakePagedApi.registry.get(id)

  override def issueToken(): String = {
    val s = entry._2
    val n = s.tokensIssued.incrementAndGet()
    if (n <= failFirstTokenIssues) {
      s.transientFailures.incrementAndGet()
      throw new TransientApiError(s"token endpoint 5xx (call $n)")
    }
    s"$id-tok-$n"
  }

  private def epochDay(micros: Long): Long = Math.floorDiv(micros, 86400000000L)

  override def listKeys(token: String, asOf: java.sql.Date): Seq[Long] = {
    val n = listKeysCalls.incrementAndGet()
    if (n <= failFirstListKeys) {
      entry._2.transientFailures.incrementAndGet()
      throw new TransientApiError(s"symbol-list endpoint 5xx (call $n)")
    }
    val cut = asOf.toLocalDate.toEpochDay
    entry._1.collect {
      case (uid, rows) if rows.exists(r => epochDay(r.ts_micros) <= cut) => uid
    }.toSeq.sorted
  }

  override def fetchPage(token: String, userId: Long, from: java.sql.Date,
      to: java.sql.Date, cursor: Option[String]): ApiPage = {
    val (data, s) = entry
    s.pageCalls.incrementAndGet()
    if (TaskContext.get() == null) s.driverPageCalls.incrementAndGet()
    else s.partitionsSeen.put(TaskContext.get().partitionId(), true)

    if (alwaysExpire) {
      s.tokenExpiries.incrementAndGet()
      throw new TokenExpiredError(s"credentials revoked: $token")
    }
    val uses = s.tokenUses.computeIfAbsent(token, _ => new AtomicInteger).incrementAndGet()
    if (tokenTtlCalls > 0 && uses > tokenTtlCalls) {
      s.tokenExpiries.incrementAndGet()
      throw new TokenExpiredError(s"token $token expired")
    }

    val lo = from.toLocalDate.toEpochDay
    val hi = to.toLocalDate.toEpochDay
    val rows = data.getOrElse(userId, Vector.empty)
      .filter(r => { val d = epochDay(r.ts_micros); d >= lo && d <= hi })
    val start = cursor.map(_.toInt).getOrElse(0)
    val pageKey = s"$userId:$from:$to:$start"
    val attempt = s.pageAttempts
      .computeIfAbsent(pageKey, _ => new AtomicInteger).incrementAndGet()
    if (poisonKey.contains(userId)) {
      s.transientFailures.incrementAndGet()
      throw new TransientApiError(s"key $userId always times out")
    }
    if (failEveryNthPage > 0 && attempt == 1 &&
        Math.floorMod(userId + start / pageSize, failEveryNthPage.toLong) == 0L) {
      s.transientFailures.incrementAndGet()
      throw new TransientApiError(s"transient 500 on $pageKey")
    }

    val slice = rows.slice(start, start + pageSize)
    val next = if (start + pageSize < rows.length) Some((start + pageSize).toString) else None
    ApiPage(slice, next)
  }
}
