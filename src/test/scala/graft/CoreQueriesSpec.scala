package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Smoke + invariant checks over the full query inventory at sf0.001.
  * (Value-level correctness is the driver's DuckDB oracle gate; these
  * cover structural invariants and keep `sbt test` meaningful.) */
class CoreQueriesSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("every registered query runs and returns a schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      assert(df.count() >= 0, name)
    }
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q05: self-union doubles total but not distinct") {
    val r = SparkEntry.queries("q05_dedup_count")(spark, sf).head()
    assert(r.getLong(0) === 2 * r.getLong(1))
  }

  test("q03 rollup invariant: Σ daily == Σ hourly == filtered count") {
    val filtered = Tables.events(spark, sf)
      .filter($"event_type".isin("purchase", "signup")).count()
    val daily = SparkEntry.queries("q03_daily_rollup")(spark, sf)
      .agg(sum($"score")).as[Long].head()
    assert(daily === filtered)
  }

  test("q12 window rank: ≤3 rows per nation, rn dense from 1") {
    val df = SparkEntry.queries("q12_window_rank")(spark, sf)
    val maxPerNation = df.groupBy($"c_nationkey").count()
      .agg(max($"count")).as[Long].head()
    assert(maxPerNation <= 3)
    assert(df.filter($"rn" < 1 || $"rn" > 3).count() === 0)
  }

  test("q16 returns 5 rows sorted by sim desc") {
    val sims = SparkEntry.queries("q16_knn_cosine")(spark, sf)
      .select($"sim").as[Double].collect()
    assert(sims.length === 5)
    assert(sims.toSeq === sims.sorted(Ordering[Double].reverse).toSeq)
  }
}
