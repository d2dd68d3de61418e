package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewOps

/** Salted two-phase plans must be result-identical to their unsalted
  * forms — checked on a synthetic corpus where one key owns 90% of the
  * rows (the shape that motivates salting). */
class SkewOpsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private lazy val skewed = {
    val rng = new scala.util.Random(3)
    Seq.fill(5000)(
      (if (rng.nextDouble() < 0.9) "hot" else s"k${rng.nextInt(50)}",
       rng.nextInt(100).toDouble))
      .toDF("key", "value")
  }

  test("saltedCount == groupBy count") {
    val direct = skewed.groupBy($"key").count()
      .as[(String, Long)].collect().toMap
    val salted = SkewOps.saltedCount(skewed, $"key", 16)
      .as[(String, Long)].collect().toMap
    assert(salted === direct)
    assert(direct("hot") > 4000)   // the skew is real
  }

  test("saltedSum == groupBy sum") {
    val direct = skewed.groupBy($"key").agg(sum($"value"))
      .as[(String, Double)].collect().toMap
    val salted = SkewOps.saltedSum(skewed, $"key", $"value", 16)
      .as[(String, Double)].collect().toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, v) =>
      assert(math.abs(v - direct(k)) < 1e-6, k)
    }
  }

  test("saltedJoin == plain inner join") {
    val dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.toDF("key", "attr")
    val direct = skewed.join(dim, "key")
      .groupBy($"key").agg(count("*").as("n"), sum($"attr").as("s"))
      .as[(String, Long, Long)].collect().toSet
    val salted = SkewOps.saltedJoin(skewed, dim, "key", 16)
      .groupBy($"key").agg(count("*").as("n"), sum($"attr").as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted === direct)
  }
}
