package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CoreQueries

/** Boundary semantics of the event-time operators, pinned on synthetic
  * timestamps: the session-window gap rule (a gap of exactly the
  * duration starts a NEW session) and the as-of join's strictly-prior
  * match rule. These are the edges the DuckDB oracles must agree on —
  * a regression here surfaces as a cross-engine mismatch. */
class EventTimeSemanticsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def eventsDf(rows: Seq[(Long, String, String, Long)]) =
    rows.toDF("user_id", "ts_s", "event_type", "event_id")
      .select($"user_id", to_timestamp($"ts_s").as("ts"),
              $"event_type", $"event_id")

  test("session gap boundary: exactly 30min merges, beyond 30min splits") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", "click", 1L),
      (1L, "2024-01-01 10:29:59", "click", 2L),   // < 30min → same session
      (1L, "2024-01-01 10:59:59", "click", 3L),   // chained < 30min → same
      (2L, "2024-01-01 10:00:00", "click", 4L),
      (2L, "2024-01-01 10:30:00", "click", 5L),   // == 30min → still merged
      (3L, "2024-01-01 10:00:00", "click", 6L),
      (3L, "2024-01-01 10:30:01", "click", 7L)))  // > 30min → NEW session
    val got = CoreQueries.sessionStats(df)
      .select($"user_id", $"n_sessions").as[(Long, Long)].collect().toMap
    assert(got(1L) === 1)
    assert(got(2L) === 1)   // Spark merges when next.start <= prev.end
    assert(got(3L) === 2)
  }

  test("as-of join matches only strictly-prior signups") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", "signup", 1L),
      (1L, "2024-01-01 10:05:00", "purchase", 2L),   // 300s after signup
      (2L, "2024-01-01 10:00:00", "purchase", 3L),   // signup at SAME ts,
      (2L, "2024-01-01 10:00:00", "signup", 4L),     //   later event_id → no match
      (3L, "2024-01-01 10:00:00", "purchase", 5L)))  // no signup at all
    val got = CoreQueries.asofStats(df)
      .select($"user_id", $"n_matched", $"total_lag_sec")
      .as[(Long, Long, Long)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(got === Map(1L -> ((1L, 300L))))
  }
}
