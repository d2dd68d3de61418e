package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SketchOps

class SketchSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("approx distinct counts are within HLL error of exact") {
    val approx = SketchOps.approxDistinct(spark, sf)
      .select($"event_type", $"approx_users")
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
}
