package graft

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{GhFetch, GhIngest}

/** The `ghevents` DSv2 micro-batch source against a LOCAL HTTP stub:
  * one poll per trigger with the reference's request shape, bounded
  * runs via maxPolls, AvailableNow = one poll, checkpoint-resumed poll
  * numbering, and cleaning parity with the file-drop ingest path. */
class GhEventsSourceSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private lazy val fixtureLines: Seq[String] = {
    val in = getClass.getResourceAsStream("/gh_events.ndjson")
    val s = scala.io.Source.fromInputStream(in, "UTF-8")
    try s.getLines().filter(_.trim.nonEmpty).toList finally s.close()
  }

  /** Stub /events endpoint serving the fixture's first 5 events as a
    * JSON array on EVERY poll (the API re-serves recent history —
    * exactly why the downstream dedup exists). Counts requests. */
  private def withStub[A](f: (String, () => Int) => A): A = {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/events", (ex: HttpExchange) => {
      hits.incrementAndGet()
      val b = ("[" + fixtureLines.take(5).mkString(",") + "]").getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/events",
      () => hits.get())
    finally server.stop(0)
  }

  test("one poll per trigger; maxPolls bounds the run; lines arrive verbatim") {
    withStub { (api, hits) =>
      val q = spark.readStream.format("ghevents")
        .option("apiUrl", api).option("maxPolls", "2")
        .load()
        .writeStream.format("memory").queryName("ghe_raw").start()
      try {
        q.processAllAvailable()
        val got = spark.table("ghe_raw").as[(Long, String)].collect().toSeq
        assert(got.map(_._1).distinct.sorted === Seq(0L, 1L))
        assert(got.size === 10, "2 polls x 5 events")
        // pollLines re-serializes each array element via jackson, so
        // compare jackson-normalized JSON (identical semantics)
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        def norm(s: String) = om.writeValueAsString(om.readTree(s))
        assert(got.filter(_._1 == 0L).map(_._2).sorted ===
          fixtureLines.take(5).map(norm).sorted)
        assert(hits() === 2, "maxPolls must stop the polling, not the sink")
      } finally q.stop()
    }
  }

  test("AvailableNow = one poll then drain; a restart continues the numbering") {
    withStub { (api, hits) =>
      val root = Files.createTempDirectory("graft-ghe-an")
      val (ckpt, out) = (s"$root/ckpt", s"$root/out")
      def drain(): Unit = {
        val q = spark.readStream.format("ghevents")
          .option("apiUrl", api)
          .load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        assert(q.awaitTermination(120000))
      }
      drain()
      assert(hits() === 1, "AvailableNow is exactly one poll")
      assert(spark.read.parquet(out).count() === 5)
      // a NEW run (fresh source instance) resumes from the checkpoint:
      // the next poll gets id 1, nothing from poll 0 is re-emitted
      drain()
      assert(hits() === 2)
      val got = spark.read.parquet(out).as[(Long, String)].collect().toSeq
      assert(got.size === 10)
      assert(got.map(_._1).distinct.sorted === Seq(0L, 1L))
    }
  }

  test("cleaning parity: ghevents → streamCleanLines ≡ file-drop → streamClean") {
    withStub { (api, _) =>
      // leg 1: the DSv2 poll source through the line-shaped cleaner
      // (two polls of identical events — the id dedup must collapse)
      val viaSource = GhIngest.streamCleanLines(
          spark.readStream.format("ghevents")
            .option("apiUrl", api).option("maxPolls", "2").load())
        .writeStream.format("memory").queryName("ghe_clean").start()
      try viaSource.processAllAvailable() finally viaSource.stop()
      // leg 2: the same polls landed as files through the reference's
      // file-drop path
      val inDir = Files.createTempDirectory("graft-ghe-files").toString
      GhFetch.pollEvents(inDir, api, token = None)
      GhFetch.pollEvents(inDir, api, token = None)
      val viaFiles = GhIngest.streamClean(spark, inDir)
        .writeStream.format("memory").queryName("ghe_clean_files").start()
      try viaFiles.processAllAvailable() finally viaFiles.stop()

      val a = spark.table("ghe_clean")
        .select($"id", $"type", $"actor.login", $"created_at")
        .as[(String, String, String, java.sql.Timestamp)].collect().toSeq.sorted
      val b = spark.table("ghe_clean_files")
        .select($"id", $"type", $"actor.login", $"created_at")
        .as[(String, String, String, java.sql.Timestamp)].collect().toSeq.sorted
      assert(a === b, "the two ingest fronts must clean identically")
      assert(a.nonEmpty && a.map(_._1).distinct.size === a.size,
        "duplicate ids across polls must collapse")
    }
  }
}
