package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CoreQueries

/** q22 (gaps-and-islands production path) and q22b (Spark's native
  * `session_window` operator) implement the SAME 30-minute session
  * rule — a session splits only when the gap STRICTLY exceeds the
  * duration. This suite pins the two plans row-for-row equal, on the
  * real events table and on adversarial synthetic timelines
  * (sub-second gaps straddling the boundary, duplicate timestamps,
  * single-event users). A drift here means one of the formulations
  * changed semantics, which would surface as an oracle hash mismatch
  * for whichever one moved.
  */
class SessionEquivalenceSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def assertSame(df: org.apache.spark.sql.DataFrame): Unit = {
    val a = CoreQueries.sessionStats(df)
      .select($"user_id", $"n_sessions", $"n_events", $"max_session_events")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val b = CoreQueries.sessionStatsSessionWindow(df)
      .select($"user_id", $"n_sessions", $"n_events", $"max_session_events")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("q22 == q22b on the sf0.001 events table") {
    assertSame(Tables.events(spark, sf))
  }

  test("q22 == q22b on sub-second boundary gaps") {
    // 30:00.000 merges; 30:00.001 splits — exercised with fractional
    // timestamps (the production path compares unix_micros precisely;
    // a seconds-truncating implementation fails user 2).
    val df = Seq(
      (1L, "2024-01-01 10:00:00.000", "click", 1L),
      (1L, "2024-01-01 10:30:00.000", "click", 2L), // == 30min → merge
      (2L, "2024-01-01 10:00:00.500", "click", 3L),
      (2L, "2024-01-01 10:30:00.501", "click", 4L), // 30:00.001 → split
      (3L, "2024-01-01 10:00:00.999", "click", 5L),
      (3L, "2024-01-01 10:30:00.998", "click", 6L), // 29:59.999 → merge
      (4L, "2024-01-01 10:00:00.000", "click", 7L), // single event
      (5L, "2024-01-01 10:00:00.000", "click", 8L),
      (5L, "2024-01-01 10:00:00.000", "click", 9L)  // duplicate ts → merge
    ).toDF("user_id", "ts_s", "event_type", "event_id")
      .select($"user_id", to_timestamp($"ts_s").as("ts"),
              $"event_type", $"event_id")
    assertSame(df)

    val got = CoreQueries.sessionStats(df)
      .select($"user_id", $"n_sessions").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }
}
