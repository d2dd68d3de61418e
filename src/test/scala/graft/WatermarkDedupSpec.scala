package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The W3 semantic parity point (SURVEY §2.10): the reference marks an
  * event id "processed" for 300 s (`SET ... EX 300`) — a duplicate
  * inside that horizon is dropped, and a re-sent id AFTER expiry is
  * re-inserted. `dropDuplicatesWithinWatermark` reproduces exactly
  * that: dedup state lives until the watermark passes it, then the
  * same id is admitted again. Driven batch-by-batch via MemoryStream. */
class WatermarkDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("duplicate ids drop within the horizon and re-admit after expiry") {
    val input = MemoryStream[(String, Timestamp)](spark)
    val deduped = input.toDF().toDF("id", "created_at")
      .withWatermark("created_at", "5 minutes")
      .dropDuplicatesWithinWatermark(Seq("id"))
    val query = deduped.writeStream
      .format("memory").queryName("wm_dedup")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: A twice within the horizon → emitted once
      input.addData(("A", ts("2025-08-10 10:00:00")),
                    ("A", ts("2025-08-10 10:01:00")))
      query.processAllAvailable()
      // batch 2: later event advances the watermark past A's state
      // (wm = 10:20 - 5min = 10:15 > 10:00) → A's dedup key expires
      input.addData(("B", ts("2025-08-10 10:20:00")))
      query.processAllAvailable()
      // batch 3: A re-sent after expiry → re-admitted (the TTL-expiry
      // behavior of the reference's event-log keys)
      input.addData(("A", ts("2025-08-10 10:21:00")))
      query.processAllAvailable()

      val out = spark.table("wm_dedup")
        .select($"id").as[String].collect().toSeq
      assert(out.count(_ == "A") === 2, s"got $out")
      assert(out.count(_ == "B") === 1)
    } finally query.stop()
  }
}
