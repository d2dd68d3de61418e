package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{DoubleBucket, HistMap}

/** Contracts for the fixed-grid order-statistic histogram (x35's
  * fused pass 1): the scalar probe expression and the grouped
  * aggregate must agree bucket-for-bucket (pass 2 re-locates rows by
  * the scalar in buckets pass 1 chose by the aggregate), bucket ids
  * must order like the doubles they contain (cumulative counts are
  * rank arithmetic), and the primitive map must count like a map. */
class HistAggregateSpec extends AnyFunSuite with SparkTestSession {

  private val specials = Seq(
    Double.NegativeInfinity, -1.7976931348623157e308, -1e10, -2.5, -1.0,
    -java.lang.Double.MIN_VALUE, -0.0, 0.0, java.lang.Double.MIN_VALUE,
    1.0, 2.5, 1e10, 1.7976931348623157e308, Double.PositiveInfinity,
    Double.NaN)

  private def randoms(n: Int): Seq[Double] = {
    val r = new scala.util.Random(42)
    (0 until n).map { _ =>
      // wide dynamic range: random sign/exponent/mantissa patterns
      java.lang.Double.longBitsToDouble(r.nextLong()) match {
        case d if d.isNaN => Double.NaN  // canonicalize like doubleToLongBits
        case d => d
      }
    }
  }

  test("graft_dbucket codegen matches the Scala route on specials and randoms") {
    graft.plans.GraftExpressions.register(spark)
    import spark.implicits._
    val vs = specials ++ randoms(2000)
    val got = vs.toDF("v")
      .select(call_function("graft_dbucket", $"v").as("b"))
      .collect().map(_.getInt(0))
    val want = vs.map(DoubleBucket.bucketOf)
    assert(got.toSeq === want)
  }

  test("bucket ids order like the doubles (NaN above +Inf, SQL order)") {
    // sort by SQL double order, then bucket ids must be non-decreasing
    val sorted = (specials ++ randoms(5000)).sortWith((a, b) =>
      org.apache.spark.sql.catalyst.util.SQLOrderingUtil
        .compareDoubles(a, b) < 0)
    val bs = sorted.map(DoubleBucket.bucketOf)
    bs.sliding(2).foreach {
      case Seq(x, y) => assert(x <= y, s"bucket order violated: $x > $y")
      case _ => ()
    }
    // NaN lands at/above +Inf's bucket
    assert(DoubleBucket.bucketOf(Double.NaN) >=
      DoubleBucket.bucketOf(Double.PositiveInfinity))
  }

  test("graft_hist == groupBy(graft_dbucket).count through a real shuffle") {
    graft.plans.GraftExpressions.register(spark)
    import spark.implicits._
    val r = new scala.util.Random(7)
    val rows = (0 until 20000).map { i =>
      (s"g${i % 3}", math.exp(r.nextGaussian() * 8)) }
    // repartition(7): multiple partial buffers per group → the
    // aggregate's merge + serialize paths actually run
    val df = rows.toDF("g", "v").repartition(7)
    val hist = df.groupBy($"g")
      .agg(call_function("graft_hist", $"v").as("h"))
      .select($"g", explode($"h").as("e"))
      .select($"g", $"e.b", $"e.cnt")
      .collect().map(x => (x.getString(0), x.getInt(1)) -> x.getLong(2)).toMap
    val want = df.groupBy($"g", call_function("graft_dbucket", $"v").as("b"))
      .count()
      .collect().map(x => (x.getString(0), x.getInt(1)) -> x.getLong(2)).toMap
    assert(hist === want)
    // emitted arrays are sorted by bucket and sum to the group size
    val arrs = df.groupBy($"g")
      .agg(call_function("graft_hist", $"v").as("h")).collect()
    arrs.foreach { row =>
      val bs = row.getSeq[org.apache.spark.sql.Row](1).map(_.getInt(0))
      assert(bs === bs.sorted)
    }
  }

  test("graft_hist skips nulls like every SQL aggregate") {
    graft.plans.GraftExpressions.register(spark)
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(2.0), None).toDF("v")
    val total = df.agg(call_function("graft_hist", $"v").as("h"))
      .select(explode($"h").as("e")).select($"e.cnt")
      .collect().map(_.getLong(0)).sum
    assert(total === 2L)
  }

  test("HistMap counts like a Map through growth, incl. Int.MinValue keys") {
    val r = new scala.util.Random(3)
    val m = new HistMap()
    val ref = scala.collection.mutable.Map[Int, Long]()
    // >> 1024·2/3 distinct keys → several grow() cycles
    (0 until 50000).foreach { _ =>
      val k = if (r.nextInt(100) == 0) Int.MinValue else r.nextInt(8192)
      val c = r.nextInt(5).toLong + 1
      m.add(k, c)
      ref(k) = ref.getOrElse(k, 0L) + c
    }
    assert(m.size === ref.size)
    val got = scala.collection.mutable.Map[Int, Long]()
    m.foreachEntry((k, v) => got(k) = v)
    assert(got === ref)
    assert(m.sortedEntries.map(_._1).toSeq ===
      ref.keys.toSeq.sorted)
  }
}
