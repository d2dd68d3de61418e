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

/** Bounded top-k heap over (score, id), ranking by (score DESC, id ASC).
  * The backing java.util.PriorityQueue is a MIN-heap under that
  * ranking, so the head is always the current worst element — O(log k)
  * offer with early reject once full. */
final class TopKHeap(val k: Int) {
  // min-heap: head = WORST of the kept entries under (score DESC, id ASC)
  // ⇒ comparator orders "worse" first: lower score, then larger id.
  private val pq = new java.util.PriorityQueue[(Double, Long)](
    math.max(1, k),
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  private def worseThanHead(s: Double, i: Long): Boolean = {
    val h = pq.peek()
    val c = java.lang.Double.compare(s, h._1)
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
      if (a._1 != b._1) a._1 > b._1 else a._2 < b._2
    }
}
