package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Long-run streaming soak (VERDICT r14 #6): the retention specs pin
  * CORRECTNESS of the serving structures over a handful of batches;
  * this suite pins the 24/7 RESOURCE claim — drive ≥200 micro-batches
  * and assert the watermark-bounded state PLATEAUS (the reference's
  * whole identity is a forever-running ingest, and a state store that
  * creeps by even one row per batch is a slow OOM on a real
  * deployment).
  *
  * Fixture shape: one parquet file per micro-batch
  * (maxFilesPerTrigger = 1), event time advancing 60 s per batch under
  * a 300 s watermark, so the fingerprint-dedup horizon holds ~6
  * batches of state at any instant — every batch both ADDS fresh
  * fingerprints and EVICTS expired ones, which is exactly the steady
  * state the plateau assertion measures.
  */
class StreamingSoakSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val Batches = 200

  private def doc(id: Long, word: String): String =
    s"the $word sat on the mat and it is a fine day in " +
      s"the sun of summer and the $word is in the end of it all"

  /** Lay down `n` single-file batches in one Spark write (partitioned
    * by batch), then move the part files into the input dir with
    * ascending mod-times + zero-padded names so the file source's
    * batch order is deterministic. Returns the input dir. */
  private def layBatches(root: String, n: Int,
                         rows: Int => Seq[(Long, String, String, java.sql.Timestamp)]): String = {
    val in = s"$root/in"
    val staged = s"$root/staged"
    (0 until n).flatMap(b => rows(b).map { case (id, src, text, t) =>
        (b, id, src, text, t) })
      .toDF("b", "doc_id", "source", "text", "event_time")
      .repartition($"b")
      .write.partitionBy("b").parquet(staged)
    Files.createDirectories(Paths.get(in))
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until n).foreach { b =>
      val part = new java.io.File(s"$staged/b=$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = Paths.get(in, f"batch_$b%04d.parquet")
      Files.move(part.toPath, dst, StandardCopyOption.ATOMIC_MOVE)
      dst.toFile.setLastModified(t0 + b * 60000L)
    }
    in
  }

  test(s"bounded curation soak: $Batches micro-batches, state plateaus") {
    val root = Files.createTempDirectory("graft-soak-cur").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(b: Int) = new java.sql.Timestamp(t0 + b * 60000L)
    // batch b: two fresh docs + (b>0) one in-horizon duplicate of the
    // previous batch's first doc — every batch exercises add, dup-drop,
    // and (past the horizon) eviction
    val in = layBatches(root, Batches, b => {
      val fresh = Seq(
        (3L * b + 1, "s1", doc(3L * b + 1, s"alpha${b}x"), ts(b)),
        (3L * b + 2, "s1", doc(3L * b + 2, s"beta${b}x"), ts(b)))
      if (b == 0) fresh
      else fresh :+ ((3L * b + 3, "s1",
        doc(3L * (b - 1) + 1, s"alpha${b - 1}x"), ts(b)))
    })
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (Batches + 50).toString)
    try {
      val q = graft.streaming.DocCuration.startCurationBounded(
        spark, in, s"$root/out", s"$root/ckpt",
        maxFilesPerTrigger = Some(1))
      assert(q.awaitTermination(600000), "soak did not drain in 10 min")
      val progress = q.recentProgress.toSeq
      assert(progress.length >= Batches,
        s"expected ≥$Batches micro-batches, saw ${progress.length}")

      // correctness under the soak: every fresh doc kept, every
      // in-horizon duplicate dropped
      val kept = spark.read.parquet(s"$root/out")
        .select($"doc_id").as[Long].collect().toSet
      val freshIds = (0 until Batches)
        .flatMap(b => Seq(3L * b + 1, 3L * b + 2)).toSet
      assert(kept == freshIds,
        s"kept ${kept.size} docs, expected the ${freshIds.size} fresh ones; " +
          s"unexpected: ${(kept -- freshIds).take(5)}, " +
          s"missing: ${(freshIds -- kept).take(5)}")

      // THE PLATEAU: state size must stop growing once the horizon
      // fills (~6 batches). Compare the late-run ceiling against the
      // mid-run ceiling — a creep of even 1 row/batch over the final
      // 100 batches would blow this bound — and pin the absolute
      // ceiling to horizon capacity (≈ 2 fresh fps/batch × ~6-batch
      // horizon, with slack for eviction running at batch end).
      val totals = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
      assert(totals.nonEmpty)
      val mid = totals.slice(40, 100)
      val late = totals.takeRight(50)
      assert(late.max <= mid.max,
        s"state grew late in the run: mid ceiling ${mid.max}, " +
          s"late ceiling ${late.max}\n totals=${totals.takeRight(60)}")
      assert(totals.max <= 40,
        s"state ceiling ${totals.max} exceeds horizon capacity")
    } finally {
      spark.conf.unset("spark.sql.streaming.numRecentProgressUpdates")
    }
  }

  test(s"dedup-index soak: $Batches micro-batches, served ≡ one-shot x02") {
    val root = Files.createTempDirectory("graft-soak-dedup").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // 2 docs per batch; every 10th batch replays an earlier batch's
    // text (a cross-batch near-dup pair the served index must find)
    val in = layBatches(root, Batches, b => {
      val first =
        if (b % 10 == 9) doc(2L * b + 1, s"gamma${b - 9}x")
        else doc(2L * b + 1, s"gamma${b}x")
      Seq((2L * b + 1, "s1", first, new java.sql.Timestamp(t0 + b * 60000L)),
          (2L * b + 2, "s1", doc(2L * b + 2, s"delta${b}x"),
            new java.sql.Timestamp(t0 + b * 60000L)))
    })
    val stateDir = s"$root/state"
    val q = graft.streaming.DedupStream.startDocStream(
      spark, in, stateDir, s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(600000), "soak did not drain in 10 min")

    // the persisted partials hold exactly one batch partition per
    // micro-batch — per-batch work stayed O(batch), no compaction
    // blowup, retention remains a partition drop
    val setParts = new java.io.File(s"$stateDir/sets").listFiles()
      .count(_.getName.startsWith("batch_id="))
    assert(setParts == Batches, s"expected $Batches sets partitions, got $setParts")

    // after 200 batches the served pairs still equal the one-shot x02
    // over the full corpus (O(batch) maintenance lost nothing)
    val served = graft.streaming.DedupStream.servedDupPairs(spark, stateDir)
      .collect().toSeq
    val oneShot = DedupOps.dedupMinhashLshOf(
        spark.read.parquet(in).select($"doc_id", $"text"))
      .collect().toSeq
    assert(served == oneShot,
      s"served ${served.length} pairs != one-shot ${oneShot.length}")
    assert(oneShot.nonEmpty, "fixture must plant cross-batch dup pairs")
  }
}
