package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SketchOps

class SketchSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("approx distinct counts are within HLL error of exact") {
    // tighter driver-side bound (5%) on the raw estimates than the 20%
    // the query's ok-booleans assert
    val approx = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", rsd = 0.02).as("a"))
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("u"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, e) =>
      val a = approx(t)
      assert(math.abs(a - e).toDouble / e < 0.05,
        s"$t: approx $a vs exact $e")
    }
  }

  test("x13 emits exact counts with all tolerance booleans TRUE") {
    val rows = SketchOps.approxDistinct(spark, sf)
      .select($"event_type", $"exact_users", $"users_ok", $"props_ok")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(2) && r.getBoolean(3)))
    val exactUsers = Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("u"))
      .as[(String, Long)].collect().toMap
    rows.foreach(r => assert(r.getLong(1) === exactUsers(r.getString(0))))
  }

  test("x34: exact overlap matches a driver-side shingle recompute; all ok") {
    val r = SketchOps.corpusOverlap(spark, sf).collect().head
    // booleans: every sketch landed within tolerance
    assert((4 to 7).forall(r.getBoolean), r.toString)
    // exact columns vs string-shingle sets recomputed from the fixture
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
    def shingles(t: String): Set[String] = {
      val w = t.toLowerCase.split("\\s+").toSeq
      if (w.size < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    // the md5(source)-parity half rule, recomputed independently
    def halfA(src: String): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(src.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    val (a, b) = docs.partition(d => halfA(d._1))
    val sa = a.iterator.flatMap(d => shingles(d._2)).toSet
    val sb = b.iterator.flatMap(d => shingles(d._2)).toSet
    assert(r.getLong(0) === sa.size.toLong)
    assert(r.getLong(1) === sb.size.toLong)
    assert(r.getLong(2) === (sa ++ sb).size.toLong)
    assert(r.getLong(3) === (sa & sb).size.toLong)
    assert(r.getLong(3) > 0L, "fixture must have cross-half overlap")
  }

  test("x34b inclusion-exclusion holds on the raw estimates") {
    val r = SketchOps.corpusOverlapSketch(spark, sf).collect().head
    assert(r.getLong(3) === r.getLong(0) + r.getLong(1) - r.getLong(2))
  }

  test("x35b: production estimates sit inside x35's exact rank bounds") {
    // the sketch-only twin re-aggregates independently (merge order may
    // differ), but its estimates must satisfy the SAME rank-error
    // contract the validated twin asserts
    val exact = SketchOps.approxQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val rows = SketchOps.approxQuantilesSketch(spark, sf).collect()
    assert(rows.length === exact.size)
    val byFlag = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_extendedprice".cast("double"))
      .as[(String, Double)].collect().groupBy(_._1)
    def quantileOf(v: Array[Double], p: Double): Double = {
      val s = v.sorted
      val pos = p * (s.length - 1)
      val lo = s(math.floor(pos).toInt); val hi = s(math.ceil(pos).toInt)
      lo + (pos - math.floor(pos)) * (hi - lo)
    }
    rows.foreach { r =>
      val vs = byFlag(r.getString(0)).map(_._2)
      val (p50, p95) = (r.getDouble(2), r.getDouble(3))
      assert(p50 >= quantileOf(vs, 0.5 - SketchOps.QuantDelta) &&
        p50 <= quantileOf(vs, 0.5 + SketchOps.QuantDelta), r.toString)
      assert(p95 >= quantileOf(vs, 0.95 - SketchOps.QuantDelta) &&
        p95 <= quantileOf(vs, 0.95 + SketchOps.QuantDelta), r.toString)
      assert(exact.contains(r.getString(0)))
    }
  }

  test("x35: estimates sit inside the exact rank-error bounds; exact match") {
    val rows = SketchOps.approxQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4) && r.getBoolean(5), r.toString)
    }
    // exact p50 vs a driver-side continuous-quantile recompute
    val byFlag = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_extendedprice".cast("double"))
      .as[(String, Double)].collect().groupBy(_._1)
    def quantile(v: Array[Double], p: Double): Double = {
      val s = v.sorted
      val pos = p * (s.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      s(lo) + (pos - lo) * (s(hi) - s(lo))
    }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val v = byFlag(r.getString(0)).map(_._2)
      assert(r.getDouble(2) === r4(quantile(v, 0.5)), s"p50 ${r.getString(0)}")
      assert(r.getDouble(3) === r4(quantile(v, 0.95)), s"p95 ${r.getString(0)}")
    }
  }

  test("bloom filter: zero false negatives, real sketch semantics") {
    val r = graft.operators.SketchOps.bloomFilter(spark, sf).collect().head
    val (nUsers, nMembers, nHits, nFn, nFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nFn === 0L, "a Bloom filter can never have a false negative")
    assert(nHits === nMembers + nFp)
    assert(nMembers > 0 && nUsers >= nMembers)
    // deterministic: the sketch is md5 arithmetic, not RNG
    val again = graft.operators.SketchOps.bloomFilter(spark, sf)
      .collect().head
    assert(r === again)
  }

  test("x25b native bloom: zero false negatives, bounded FPs, agrees with the exact twin") {
    val r = graft.operators.SketchOps.bloomFilterNative(spark, sf)
      .collect().head
    val (nUsers, nMembers, nHits, nFn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nFn === 0L, "a Bloom filter can never have a false negative")
    assert(nHits >= nMembers)
    // 4096 bits for ≲1k keys: the FP rate stays far under 10% of the
    // non-member population
    assert(nHits - nMembers <= (nUsers - nMembers) / 10,
      s"FP count ${nHits - nMembers} of ${nUsers - nMembers} non-members")
    // the exact fields agree with the relational twin (x25)
    val exact = graft.operators.SketchOps.bloomFilter(spark, sf)
      .collect().head
    assert((nUsers, nMembers) === ((exact.getLong(0), exact.getLong(1))))
  }
}
