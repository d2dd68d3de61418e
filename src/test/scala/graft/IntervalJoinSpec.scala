package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CoreQueries

/** x45 interval join: the bucketized equi-join must produce exactly
  * the pairs a brute-force BETWEEN join produces — recomputed here
  * driver-side over the raw events, independent of the bucketing. */
class IntervalJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("x45: bucketized equi-join ≡ brute-force BETWEEN recompute") {
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts".cast("long").as("sec"))
      .as[(Long, Long)].collect().toSeq
    val intervals = ev.filter(_._1 % CoreQueries.IntervalOwnerMod == 0)
      .groupBy(_._1).toSeq.flatMap { case (u, xs) =>
        val secs = xs.map(_._2).sorted
        secs.foldLeft(List.empty[(Long, Long)]) {
          case ((s, e) :: rest, t) if t - e <= CoreQueries.IntervalGapSec =>
            (s, t) :: rest
          case (acc, t) => (t, t) :: acc
        }.reverse.map { case (s, e) => (u, s, e) }
      }
    val probe = ev.filter(_._1 % CoreQueries.IntervalOwnerMod != 0)
    val expected = intervals.flatMap { case (u, s, e) =>
      val hits = probe.filter(p => p._2 >= s && p._2 <= e)
      if (hits.isEmpty) Nil
      else Seq((u, s, e, hits.size.toLong,
        hits.map(_._1).distinct.size.toLong))
    }.sortBy(t => (t._1, t._2, t._3))
    val got = CoreQueries.intervalJoin(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty, "fixture should produce overlapping activity")
    assert(got === expected)
  }
}
