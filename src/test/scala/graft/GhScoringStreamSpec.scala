package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.{GhBackfill, GhIngest}

/** End-to-end incremental scoring: bronze ingest stream → stateful
  * update-mode hourly aggregation → foreachBatch upsert into the
  * partitioned hourly table. The second batch updates an EXISTING hour
  * partition and must merge (not overwrite) it — the reference's
  * incremental ZUNIONSTORE semantics, made idempotent (SURVEY §7.4.1). */
class GhScoringStreamSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("incremental upsert across two streamed batches") {
    val root = Files.createTempDirectory("graft-scoring")
    val in = root.resolve("in"); Files.createDirectories(in)
    val bronze = s"$root/bronze"
    val hourly = s"$root/hourly"
    Files.copy(getClass.getResourceAsStream("/gh_events.ndjson"),
      in.resolve("batch1.ndjson"))

    // batch 1: full fixture through ingest + scoring
    GhIngest.startIngest(spark, in.toString, bronze, s"$root/ckpt-ingest")
      .awaitTermination(60000)
    GhIngest.startScoring(spark, bronze, hourly, s"$root/ckpt-score")
      .awaitTermination(60000)

    val after1 = spark.read.parquet(hourly)
      .select(date_format($"hour", "yyyy-MM-dd HH").as("h"), $"login", $"score")
      .as[(String, String, Long)].collect().toSet
    assert(after1 === Set(
      ("2025-08-10 12", "octocat", 1L),
      ("2025-08-10 12", "botanist-dev", 1L),
      ("2025-08-10 12", "nightowl", 1L),
      ("2025-08-10 13", "nightowl", 1L),
      ("2025-08-10 23", "midnighter", 1L),
      ("2025-08-11 00", "midnighter", 1L)))

    // batch 2: two more events inside the already-materialized hour
    // 2025-08-11T00 (above the watermark): octocat joins the partition,
    // midnighter's score increments — both must MERGE with the existing
    // partition contents.
    val extra = Seq(
      """{"id": "2001", "type": "PushEvent", "actor": {"id": 1, "login": "octocat", "display_login": "octocat", "gravatar_id": "", "url": "u", "avatar_url": "a"}, "repo": {"id": 10, "name": "x/y", "url": "r"}, "payload": {"push_id": 21}, "public": true, "created_at": "2025-08-11T00:05:00Z"}""",
      """{"id": "2002", "type": "PushEvent", "actor": {"id": 15, "login": "midnighter", "display_login": "midnighter", "gravatar_id": "", "url": "u", "avatar_url": "a"}, "repo": {"id": 24, "name": "x/y", "url": "r"}, "payload": {"push_id": 22}, "public": true, "created_at": "2025-08-11T00:06:00Z"}""")
    Files.write(in.resolve("batch2.ndjson"),
      extra.mkString("\n").getBytes("UTF-8"))

    GhIngest.startIngest(spark, in.toString, bronze, s"$root/ckpt-ingest")
      .awaitTermination(60000)
    GhIngest.startScoring(spark, bronze, hourly, s"$root/ckpt-score")
      .awaitTermination(60000)

    val after2 = spark.read.parquet(hourly)
      .select(date_format($"hour", "yyyy-MM-dd HH").as("h"), $"login", $"score")
      .as[(String, String, Long)].collect().toSet
    assert(after2 === Set(
      ("2025-08-10 12", "octocat", 1L),
      ("2025-08-10 12", "botanist-dev", 1L),
      ("2025-08-10 12", "nightowl", 1L),
      ("2025-08-10 13", "nightowl", 1L),
      ("2025-08-10 23", "midnighter", 1L),
      ("2025-08-11 00", "midnighter", 2L),   // state carried the running total
      ("2025-08-11 00", "octocat", 1L)))     // merged into existing partition

    // the incremental table equals a from-scratch batch recompute
    val batchRecompute = GhIngest.hourlyScores(
        GhIngest.dedupEvents(spark.read.parquet(bronze)))
      .select(date_format($"hour", "yyyy-MM-dd HH").as("h"), $"login", $"score")
      .as[(String, String, Long)].collect().toSet
    assert(after2 === batchRecompute)
  }
}
