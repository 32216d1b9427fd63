package graft.functions.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a size-≤k binary heap with the WORST element at
  * the root (so an incoming better element evicts it in O(log k)).
  * Ranking order is (score DESC, id ASC); "worst" is the element that
  * would rank last. NaN follows [[java.lang.Double.compare]] — greater
  * than +∞ — matching both Spark's and DuckDB's ORDER BY treatment, so
  * the aggregate and a row_number() oracle agree on all doubles. */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** true iff (s1,i1) ranks AFTER (s2,i2) under (score DESC, id ASC). */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); scores(i) = scores(p); scores(p) = ts
        val ti = ids(i); ids(i) = ids(p); ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      val ts = scores(i); scores(i) = scores(w); scores(w) = ts
      val ti = ids(i); ids(i) = ids(w); ids(w) = ti
      i = w
    }
  }

  def insert(s: Double, id: Long): Unit =
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown()
    }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (score, id) pairs in rank order (best first). */
  def sorted: Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](size)
    var i = 0
    while (i < size) { out(i) = (scores(i), ids(i)); i += 1 }
    java.util.Arrays.sort(out, new java.util.Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int =
        if (worse(b._1, b._2, a._1, a._2)) -1
        else if (worse(a._1, a._2, b._1, b._2)) 1
        else 0
    })
    out
  }
}

/** Native top-k-per-group aggregate: `graft_topk(score, id, k)` keeps the
  * k best (score DESC, id ASC) rows per group in a bounded heap and
  * returns them rank-ordered as `array<struct<score:double, id:bigint>>`.
  *
  * Versus the window formulation (`row_number() OVER (...) <= k`, which
  * modern Catalyst already bounds map-side via WindowGroupLimit /
  * SPARK-37099): that plan still SORTS every map partition in full under
  * its partial limit — O(n log n) per task with partition-sized sort
  * buffers — where this aggregate streams each slice through a bounded
  * heap in O(n log k) with O(groups×k) fixed memory, ships only
  * serialized heaps through the exchange (merge is heap-union), and
  * composes with other aggregates in the same groupBy pass (one scan,
  * one exchange — the window form needs its own pass). See
  * graft.operators.TopK for the measured comparison.
  *
  * Null `score` or `id` rows are ignored (standard SQL aggregate
  * null-skip; the row_number oracle form must filter them identically).
  */
case class TopKByScore(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k > 0, s"graft_topk needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)): Any
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    // ≤k elements by construction; heap order is not serialized, re-insert
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKByScore =
    copy(score = cs(0), id = cs(1))
  override def prettyName: String = "graft_topk"
}

/** Bounded heap over ARBITRARY orderable keys: ≤k (key, payload) pairs
  * with the LARGEST key at the root, so the k smallest keys survive.
  * Values are catalyst values already copied by the caller. */
final class OrdHeap(val k: Int, ord: Ordering[Any]) {
  val keys = new Array[Any](k)
  val vals = new Array[Any](k)
  var size = 0

  /** true iff a ranks AFTER b (larger key = worse under keep-smallest). */
  @inline private def worse(a: Any, b: Any): Boolean = ord.compare(a, b) > 0

  private def swap(i: Int, j: Int): Unit = {
    val tk = keys(i); keys(i) = keys(j); keys(j) = tk
    val tv = vals(i); vals(i) = vals(j); vals(j) = tv
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(keys(i), keys(p))) { swap(i, p); i = p } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < size && worse(keys(l), keys(w))) w = l
      if (r < size && worse(keys(r), keys(w))) w = r
      if (w == i) return
      swap(i, w)
      i = w
    }
  }

  /** Caller passes OWNED (copied) values — the heap stores them as-is. */
  def insert(key: Any, v: Any): Unit =
    if (size < k) {
      keys(size) = key; vals(size) = v; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(keys(0), key)) {
      keys(0) = key; vals(0) = v
      siftDown()
    }

  def mergeFrom(other: OrdHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.keys(i), other.vals(i)); i += 1 }
  }

  /** Payloads in rank order (smallest key first). */
  def sortedPayloads: Array[Any] = {
    val idx = Array.tabulate(size)(identity)
    val out = new Array[Any](size)
    val sorted = idx.sortWith((a, b) => ord.compare(keys(a), keys(b)) < 0)
    var i = 0
    while (i < size) { out(i) = vals(sorted(i)); i += 1 }
    out
  }
}

/** Generic bounded top-k aggregate: `graft_topk_ord(ord, payload, k)`
  * keeps the k rows with the SMALLEST `ord` values (any orderable type —
  * struct keys give multi-column rank orders; encode DESC by negating the
  * component) and returns their `payload`s rank-ordered as
  * `array<payload-type>`.
  *
  * This generalizes [[TopKByScore]] beyond (double, long) pairs — the
  * per-group argmax/top-k shapes whose ranking key mixes types (t10's
  * `(tf DESC, df ASC, term ASC)` with a STRING tiebreak) get the same
  * O(n log k) bounded-memory partial aggregation the scored form has:
  * each map task ships ≤k rows per group through the exchange and no
  * partition-wide sort ever runs. Comparison is Spark's interpreted
  * ordering for the key type — identical to ORDER BY on the same struct
  * (strings compare bytewise, matching DuckDB's binary varchar collation,
  * so a row_number oracle agrees).
  *
  * The caller must make `ord` unique per group (include the tiebreak
  * column in the key) — equal keys rank in arrival order, which is
  * nondeterministic under parallel merge. Null-skip: rows whose ord or
  * payload evaluates to null are ignored, matching aggregate convention;
  * null COMPONENTS inside a struct key order nulls-first per Spark's
  * interpreted struct ordering. */
case class TopKByOrdering(ordKey: Expression, payload: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[OrdHeap] {
  require(k > 0, s"graft_topk_ord needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(ordKey, payload)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.util.TypeUtils.checkForOrderingExpr(
      ordKey.dataType, prettyName)

  @transient private lazy val ordering: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(ordKey.dataType)

  override def createAggregationBuffer(): OrdHeap = new OrdHeap(k, ordering)

  override def update(buf: OrdHeap, input: InternalRow): OrdHeap = {
    val kv = ordKey.eval(input)
    val pv = payload.eval(input)
    if (kv != null && pv != null)
      // copy BOTH: eval may return views into reused row buffers
      buf.insert(InternalRow.copyValue(kv), InternalRow.copyValue(pv))
    buf
  }

  override def merge(buf: OrdHeap, other: OrdHeap): OrdHeap = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: OrdHeap): Any =
    new GenericArrayData(buf.sortedPayloads)

  // (key, payload) pairs ride the shuffle as length-prefixed UnsafeRows
  @transient private lazy val serProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(Array(ordKey.dataType, payload.dataType))
  @transient private lazy val pairRow = new GenericInternalRow(2)

  override def serialize(buf: OrdHeap): Array[Byte] = {
    val chunks = new Array[Array[Byte]](buf.size)
    var total = 4
    var i = 0
    while (i < buf.size) {
      pairRow.update(0, buf.keys(i))
      pairRow.update(1, buf.vals(i))
      // UnsafeRow.getBytes returns the projection's REUSED backing buffer
      // (no copy) whenever sizeInBytes equals the buffer length exactly —
      // e.g. fixed-size struct payloads. Copy per pair or later apply()
      // calls overwrite earlier chunks.
      val ur = serProj.apply(pairRow)
      chunks(i) = java.util.Arrays.copyOf(ur.getBytes(), ur.getSizeInBytes())
      total += 4 + chunks(i).length
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(buf.size)
    i = 0
    while (i < buf.size) { bb.putInt(chunks(i).length); bb.put(chunks(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): OrdHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new OrdHeap(k, ordering)
    val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val chunk = new Array[Byte](len)
      bb.get(chunk)
      row.pointTo(chunk, len)
      // copy out of the chunk-backed row before the next iteration reuses it
      buf.insert(
        InternalRow.copyValue(row.get(0, ordKey.dataType)),
        InternalRow.copyValue(row.get(1, payload.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByOrdering =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByOrdering =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKByOrdering =
    copy(ordKey = cs(0), payload = cs(1))
  override def prettyName: String = "graft_topk_ord"
}
