package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-K as a custom TypedImperativeAggregate: per group, a
  * bounded min-heap of (score, id) pairs ordered by (score DESC,
  * id ASC), emitted as a sorted array<struct<score,id>>.
  *
  * The built-in way to get per-key top-K is a window `row_number` +
  * filter, which SORTS every partition fully. This aggregate keeps k
  * elements per group, updates in O(log k), and merges partial heaps
  * map-side before the shuffle — at 100 TB the shuffle carries k rows
  * per group instead of every row, which is the difference between a
  * top-K and a global sort. Buffer serialization is a flat
  * ByteBuffer of (count, score, id)* — no reflection, no Kryo.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, s"graft_topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKPairs.entryType, containsNull = false)
  override def prettyName: String = "graft_topk"

  /** Fail at analysis, not with an executor-side ClassCastException:
    * the function is registered session-wide, so arbitrary SQL can
    * reach it with any argument types. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk id must be BIGINT, got ${id.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKHeap): Any = {
    val sorted = buf.sortedEntries   // (score DESC, id ASC)
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val es = buf.entries
    val bb = ByteBuffer.allocate(4 + es.length * 16)
    bb.putInt(es.length)
    es.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var j = 0
    while (j < n) { h.offer(bb.getDouble, bb.getLong); j += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), id = cs(1))
}

object TopKPairs {
  val entryType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))
}

/** Grouped top-K for SMALL k as a DeclarativeAggregate: the buffer is
  * 2k+1 fixed-width slots (k scores, k ids, a row count) kept sorted by
  * (score DESC, id ASC), updated and merged by pure CASE-expression
  * insertion networks.
  *
  * Why a second implementation: TypedImperativeAggregate runs under
  * ObjectHashAggregateExec — per-row INTERPRETED expression eval, boxed
  * heap entries, and a sort-based fallback after
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default
  * 128!) distinct keys per partition, which silently re-introduces the
  * full per-partition sort the aggregate exists to avoid. A flat
  * (double/long) buffer instead qualifies for HashAggregateExec inside
  * WHOLE-STAGE CODEGEN: no fallback cliff, no object churn, map-side
  * partials in the Unsafe hash map. On the x65 candidate relation this
  * is the difference between the aggregate being the bottleneck and it
  * riding the scan. The expression networks grow ~3^k per slot, so this
  * route is capped at MaxK and graft_topk transparently routes small k
  * here and larger k to the heap (equivalence spec-pinned both ways).
  *
  * Ordering uses SQL comparison semantics (SQLOrderingUtil: NaN largest,
  * -0.0 == 0.0) — identical to the window row_number formulation; the
  * heap's comparator matches (TopKHeap uses the same utility). */
case class TopKSmallPairs(score: Expression, id: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate {

  import org.apache.spark.sql.catalyst.expressions._

  require(k >= 1 && k <= TopKSmallPairs.MaxK,
    s"graft_topk small-k route requires 1 <= k <= ${TopKSmallPairs.MaxK}, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKPairs.entryType, containsNull = false)
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk id must be BIGINT, got ${id.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  // slot j holds the (j+1)-th best (score, id); empty slots hold the
  // sentinel (-Inf, Long.MaxValue), which loses to every real entry and
  // never displaces anything on merge
  private lazy val sSlots: Seq[AttributeReference] =
    (0 until k).map(j => AttributeReference(s"s$j", DoubleType, nullable = false)())
  private lazy val iSlots: Seq[AttributeReference] =
    (0 until k).map(j => AttributeReference(s"i$j", LongType, nullable = false)())
  private lazy val cnt: AttributeReference =
    AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    sSlots ++ iSlots :+ cnt

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(k)(Literal(Double.NegativeInfinity)) ++
    Seq.fill(k)(Literal(Long.MaxValue)) :+ Literal(0L)

  /** (es, eid) strictly better than (bs, bid) under (score DESC, id ASC).
    * Spark's binary comparisons on DOUBLE use SQL total order. */
  private def beats(es: Expression, eid: Expression,
      bs: Expression, bid: Expression): Expression =
    Or(GreaterThan(es, bs), And(EqualTo(es, bs), LessThan(eid, bid)))

  /** Insertion network: new slot values after inserting (es, eid) into
    * the sorted slots (ss, is). Slot 0: e or old head. Slot j>0: old
    * slot j-1 if e landed at or above j-1, else e if it lands at j,
    * else unchanged. */
  private def insert(es: Expression, eid: Expression,
      ss: Seq[Expression], is: Seq[Expression])
      : (Seq[Expression], Seq[Expression]) = {
    val ns = Array.ofDim[Expression](k)
    val ni = Array.ofDim[Expression](k)
    var j = 0
    while (j < k) {
      if (j == 0) {
        val c = beats(es, eid, ss(0), is(0))
        ns(0) = If(c, es, ss(0))
        ni(0) = If(c, eid, is(0))
      } else {
        val cAbove = beats(es, eid, ss(j - 1), is(j - 1))
        val cHere = beats(es, eid, ss(j), is(j))
        ns(j) = If(cAbove, ss(j - 1), If(cHere, es, ss(j)))
        ni(j) = If(cAbove, is(j - 1), If(cHere, eid, is(j)))
      }
      j += 1
    }
    (ns.toSeq, ni.toSeq)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val miss = Or(IsNull(score), IsNull(id))
    val es = KnownNotNull(score)
    val eid = KnownNotNull(id)
    val (ns, ni) = insert(es, eid, sSlots, iSlots)
    sSlots.lazyZip(ns).map((old, n) => If(miss, old, n)) ++
    iSlots.lazyZip(ni).map((old, n) => If(miss, old, n)) :+
    If(miss, cnt, Add(cnt, Literal(1L)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // fold the right buffer's k slots into the left buffer: sentinels
    // never displace real entries, so all k inserts are unconditional
    var ss: Seq[Expression] = sSlots.map(_.left)
    var is: Seq[Expression] = iSlots.map(_.left)
    var j = 0
    while (j < k) {
      val (ns, ni) = insert(sSlots(j).right, iSlots(j).right, ss, is)
      ss = ns; is = ni
      j += 1
    }
    ss ++ is :+ Add(cnt.left, cnt.right)
  }

  override lazy val evaluateExpression: Expression = {
    val entries = (0 until k).map { j =>
      CreateNamedStruct(Seq(
        Literal("score"), sSlots(j), Literal("id"), iSlots(j)))
    }
    Slice(CreateArray(entries), Literal(1),
      Cast(Least(Seq(cnt, Literal(k.toLong))), IntegerType))
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), id = cs(1))
}

object TopKSmallPairs {
  /** Expression-network size grows ~3^k per slot (the merge network
    * substitutes each insert level into the next): measured at k=5 the
    * generated merge is large enough to fall off efficient codegen and
    * the query runs ~30× slower than the heap — so the declarative
    * route is capped where it is strictly faster and the bounded heap
    * (TopKPairs) keeps everything larger. */
  val MaxK = 3
}

/** Bounded top-k heap over (score, id), ranking by (score DESC, id ASC).
  * The backing java.util.PriorityQueue is a MIN-heap under that
  * ranking, so the head is always the current worst element — O(log k)
  * offer with early reject once full. */
final class TopKHeap(val k: Int) {
  // min-heap: head = WORST of the kept entries under (score DESC, id ASC)
  // ⇒ comparator orders "worse" first: lower score, then larger id.
  // score comparisons use SQL total order (SQLOrderingUtil: NaN largest,
  // -0.0 == 0.0) so the heap ranks exactly like the window row_number
  // and the declarative TopKSmallPairs formulations
  private def cmpScore(x: Double, y: Double): Int =
    org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(x, y)

  private val pq = new java.util.PriorityQueue[(Double, Long)](
    math.max(1, k),
    (a: (Double, Long), b: (Double, Long)) => {
      val c = cmpScore(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  private def worseThanHead(s: Double, i: Long): Boolean = {
    val h = pq.peek()
    val c = cmpScore(s, h._1)
    c < 0 || (c == 0 && i > h._2)
  }

  def offer(s: Double, i: Long): Unit = {
    if (k <= 0) ()   // defensive: TopKPairs rejects k <= 0 at build time
    else if (pq.size < k) pq.offer((s, i))
    else if (!worseThanHead(s, i)) { pq.poll(); pq.offer((s, i)) }
  }

  def mergeFrom(other: TopKHeap): Unit =
    other.entries.foreach { case (s, i) => offer(s, i) }

  def entries: Array[(Double, Long)] =
    pq.toArray(new Array[(Double, Long)](pq.size))

  def sortedEntries: Array[(Double, Long)] =
    entries.sortWith { (a, b) =>
      val c = cmpScore(a._1, b._1)
      if (c != 0) c > 0 else a._2 < b._2
    }
}
