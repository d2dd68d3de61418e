package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fixed-grid value histogram for distributed order statistics.
  *
  * The bucket of a double is the top [[DoubleBucket.Bits]] bits of its
  * IEEE-754 SORTABLE long (sign-extended arithmetic shift), i.e.
  * `bits ^ ((bits >> 63) & 0x7fff…)` — the standard total-order
  * transform: bucket ids compare (as signed ints) exactly like the
  * doubles they contain, with NaN above +Inf (SQL's "NaN largest").
  * With 20 bits the grid is sign + full exponent + 8 mantissa bits:
  * 256 sub-buckets per power of two, so any value distribution lands
  * ~n/(256·octaves) rows per bucket — fine enough that re-scanning a
  * handful of located buckets touches a small fraction of the corpus,
  * coarse enough that a per-group histogram stays a few thousand
  * entries.
  *
  * Why a fixed grid instead of an equi-width [min,max] grid: min/max
  * only exist AFTER a scan, so an equi-width histogram forces a
  * separate corpus pass before bucketing can begin (round-11's x35
  * shape). The fixed grid needs no data statistics, so the histogram
  * aggregate rides the SAME scan as any other grouped aggregate —
  * x35's GK-sketch pass gets the exact branch's pass 1 for free.
  *
  * One soft edge, documented rather than special-cased: -0.0 and +0.0
  * are SQL-equal but land in adjacent buckets (sortable -1 vs 0). Rank
  * location still returns a numerically-equal value — only its sign
  * bit can differ from the single-sorted-array formulation's pick.
  */
object DoubleBucket {
  /** Top bits kept: 1 sign + 11 exponent + 8 mantissa. */
  val Bits = 20
  val Shift = 64 - Bits

  /** Bucket id; compares like the double. Mirrored by the codegen in
    * [[DoubleBucketExpr.doGenCode]] — HistAggregateSpec pins the two
    * routes identical over the full double range incl. specials. */
  def bucketOf(v: Double): Int = {
    val bits = java.lang.Double.doubleToLongBits(v)
    val sortable = bits ^ ((bits >> 63) & 0x7fffffffffffffffL)
    (sortable >> Shift).toInt
  }
}

/** Scalar `graft_dbucket(v)`: the fixed-grid bucket id of a double —
  * the probe-side twin of [[SortableHist]], used by an order-statistic
  * pass 2 to re-locate rows in the buckets pass 1's histogram chose.
  * Codegen'd: it sits on full-corpus scans. */
case class DoubleBucketExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = GraftExpressions.DBucketFn

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a double, got ${t.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    DoubleBucket.bucketOf(v.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bits = ctx.freshName("bits")
      s"""
         |long $bits = Double.doubleToLongBits($v);
         |$bits = $bits ^ (($bits >> 63) & 0x7fffffffffffffffL);
         |${ev.value} = (int) ($bits >> ${DoubleBucket.Shift});
         |""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Grouped `graft_hist(v)`: per-group counts over the fixed
  * [[DoubleBucket]] grid, emitted as array<struct<b:int, cnt:bigint>>
  * sorted by bucket — bounded (≤ distinct buckets present), mergeable
  * (counts add), so partials combine map-side and the shuffle carries
  * one small map per group instead of the group's rows. Cumulative
  * sums over the emitted array locate, for any target rank, the bucket
  * holding that order statistic and its rank offset within the bucket.
  * Nulls are skipped, like every SQL aggregate. State is a primitive
  * open-addressing map ([[HistMap]]): the update path runs once per
  * corpus row under interpreted ObjectHashAggregate eval, so a boxed
  * java.util.HashMap's three allocations per row would dominate the
  * whole aggregate. */
case class SortableHist(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HistMap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(SortableHist.entryType, containsNull = false)
  override def prettyName: String = GraftExpressions.HistFn

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a double, got ${t.simpleString}")
    }

  override def createAggregationBuffer(): HistMap = new HistMap()

  override def update(buf: HistMap, input: InternalRow): HistMap = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(DoubleBucket.bucketOf(v.asInstanceOf[Double]), 1L)
    }
    buf
  }

  override def merge(buf: HistMap, other: HistMap): HistMap = {
    other.foreachEntry((b, c) => buf.add(b, c))
    buf
  }

  override def eval(buf: HistMap): Any = {
    val es = buf.sortedEntries   // (bucket ASC, count)
    new GenericArrayData(es.map { case (b, c) =>
      new GenericInternalRow(Array[Any](b, c))
    })
  }

  override def serialize(buf: HistMap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 12)
    bb.putInt(buf.size)
    buf.foreachEntry((b, c) => { bb.putInt(b); bb.putLong(c) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HistMap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new HistMap()
    var j = 0
    while (j < n) { m.add(bb.getInt, bb.getLong); j += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): SortableHist =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SortableHist =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

object SortableHist {
  val entryType: StructType = StructType(Seq(
    StructField("b", IntegerType, nullable = false),
    StructField("cnt", LongType, nullable = false)))
}

/** Primitive int→long counter map: open addressing, linear probing,
  * power-of-two capacity, grow at 2/3 load. No boxing on the per-row
  * add path. Occupancy is tracked in a parallel flag array so EVERY
  * int (including Int.MinValue, a legal bucket id) is a valid key. */
final class HistMap {
  private var cap = 1 << 10
  private var keys = new Array[Int](cap)
  private var vals = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  private def idxOf(k: Int, ks: Array[Int], us: Array[Boolean], mask: Int): Int = {
    var i = (k * 0x9E3779B9) >>> (Integer.numberOfLeadingZeros(mask + 1) + 1)
    i &= mask
    while (us(i) && ks(i) != k) i = (i + 1) & mask
    i
  }

  def add(k: Int, c: Long): Unit = {
    val i = idxOf(k, keys, used, cap - 1)
    if (used(i)) vals(i) += c
    else {
      used(i) = true; keys(i) = k; vals(i) = c; n += 1
      if (n * 3 > cap * 2) grow()
    }
  }

  private def grow(): Unit = {
    val nc = cap << 1
    val nk = new Array[Int](nc); val nv = new Array[Long](nc)
    val nu = new Array[Boolean](nc)
    var i = 0
    while (i < cap) {
      if (used(i)) {
        val j = idxOf(keys(i), nk, nu, nc - 1)
        nu(j) = true; nk(j) = keys(i); nv(j) = vals(i)
      }
      i += 1
    }
    cap = nc; keys = nk; vals = nv; used = nu
  }

  def foreachEntry(f: (Int, Long) => Unit): Unit = {
    var i = 0
    while (i < cap) { if (used(i)) f(keys(i), vals(i)); i += 1 }
  }

  def sortedEntries: Array[(Int, Long)] = {
    val out = new Array[(Int, Long)](n)
    var j = 0
    foreachEntry((k, v) => { out(j) = (k, v); j += 1 })
    java.util.Arrays.sort(out, (a: (Int, Long), b: (Int, Long)) =>
      Integer.compare(a._1, b._1))
    out
  }
}
