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

  test("durable landing: an uncommitted poll replays from the archive across restart") {
    withStub { (api, hits) =>
      val root = Files.createTempDirectory("graft-ghe-dur")
      val (ckpt, arch) = (s"$root/ckpt", s"$root/archive")
      val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
      val failBatch1Once = new java.util.concurrent.atomic.AtomicBoolean(true)
      def run(expectFail: Boolean): Unit = {
        val q = spark.readStream.format("ghevents")
          .option("apiUrl", api).option("archiveDir", arch)
          .load()
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
            // batch 1 "crashes the driver" after its offset is WAL'd
            // but before it commits — the exact window the archive
            // exists to cover
            if (bid == 1L && failBatch1Once.getAndSet(false))
              throw new RuntimeException("simulated driver crash")
            df.collect().foreach(r =>
              seen += ((bid, r.getLong(0), r.getString(1))))
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        if (expectFail)
          intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
            q.awaitTermination(120000); q.stop()
            throw new AssertionError("batch 1 must fail this run")
          }
        else assert(q.awaitTermination(120000))
      }
      run(expectFail = false)   // batch 0 = poll 0, committed
      run(expectFail = true)    // poll 1 fetched+landed, batch 1 dies
      run(expectFail = false)   // fresh "driver": batch 1 REPLAYS, then poll 2
      assert(hits() === 3, "the replayed batch must come from the " +
        "archive, not a fresh poll")

      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      def norm(s: String) = om.writeValueAsString(om.readTree(s))
      val wantLines = fixtureLines.take(5).map(norm).sorted
      // the crashed poll's rows arrive intact in the replayed batch
      val replayed = seen.filter(_._1 == 1L)
      assert(replayed.map(_._2).distinct === Seq(1L))
      assert(replayed.map(_._3).sorted === wantLines)
      assert(seen.filter(_._1 == 0L).size === 5)
      assert(seen.filter(_._1 == 2L).map(_._2).distinct === Seq(2L))

      // archive ≡ the file-drop landing shape: one NDJSON file per
      // poll, lines verbatim — consumable by the file-drop ingest
      val files = new java.io.File(arch).listFiles()
        .filter(_.getName.endsWith(".ndjson")).map(_.getName).sorted
      assert(files.toSeq === Seq("poll-000000.ndjson",
        "poll-000001.ndjson", "poll-000002.ndjson"))
      val landed = scala.io.Source.fromFile(s"$arch/poll-000001.ndjson", "UTF-8")
      val got = try landed.getLines().toList finally landed.close()
      assert(got.sorted === wantLines)
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
