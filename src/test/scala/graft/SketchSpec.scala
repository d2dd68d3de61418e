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
}
