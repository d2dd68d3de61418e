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
                         rows: Int => Seq[(Long, String, String, java.sql.Timestamp)],
                         offset: Int = 0): String = {
    val in = s"$root/in"
    val staged = s"$root/staged$offset"
    (offset until offset + n).flatMap(b => rows(b).map { case (id, src, text, t) =>
        (b, id, src, text, t) })
      .toDF("b", "doc_id", "source", "text", "event_time")
      .repartition($"b")
      .write.partitionBy("b").parquet(staged)
    Files.createDirectories(Paths.get(in))
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (offset until offset + n).foreach { b =>
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

  test(s"takedown under continuous ingest: applyRemovals fires mid-soak, the gate forgets by the NEXT batch") {
    // the one serving-structure lifecycle the 200-batch soaks above
    // don't cross: COMPLIANCE UNDER CONTINUOUS INGEST. 120 batches
    // land, a takedown closure is excised MID-LIFECYCLE (between
    // triggers — the maintenance op runs in the owner process at a
    // micro-batch boundary, the StateMaintenance ownership contract),
    // then ingest RESUMES from the same checkpoint for 80 more
    // batches. The gate must forget the removed content before the
    // next batch lands; nothing later may resurrect it; and the
    // per-batch state shape must survive the rewrite.
    val root = Files.createTempDirectory("graft-soak-takedown").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(b: Int) = new java.sql.Timestamp(t0 + b * 60000L)
    // word plan: every 10th batch replays the word of 9 batches ago
    // (a cross-batch near-dup pair); batches 120 and 130 — both AFTER
    // the takedown — replay the REMOVED word eps0x, so the corpus
    // re-encounters taken-down content under fresh doc ids
    def wordFor(b: Int): String =
      if (b == 120 || b == 130) "eps0x"
      else if (b % 10 == 9) s"eps${b - 9}x"
      else s"eps${b}x"
    def rowsFor(b: Int) = Seq(
      (2L * b + 1, "s1", doc(2L * b + 1, wordFor(b)), ts(b)),
      (2L * b + 2, "s1", doc(2L * b + 2, s"zeta${b}x"), ts(b)))

    val in = layBatches(root, 120, rowsFor)
    val stateDir = s"$root/state"
    val q1 = graft.streaming.DedupStream.startDocStream(
      spark, in, stateDir, s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q1.awaitTermination(600000), "phase-1 soak did not drain")

    // the takedown closure by construction: doc 1 (batch 0, eps0x)
    // and its near-dup doc 19 (batch 9's replay)
    val removed = Seq(1L, 19L)
    val probe = Seq((9001L, doc(9001L, "eps0x")))
      .toDF("doc_id", "text")
    val flaggedBefore = graft.streaming.DedupStream
      .servedIncomingDups(spark, stateDir, probe)
      .select($"dup_of").as[Long].collect().toSet
    assert(flaggedBefore == removed.toSet,
      s"pre-takedown gate must flag the planted cluster, got $flaggedBefore")

    graft.streaming.DedupStream.applyRemovals(spark, stateDir, removed)

    // the gate forgets IMMEDIATELY — before any further batch lands
    val flaggedAfter = graft.streaming.DedupStream
      .servedIncomingDups(spark, stateDir, probe)
      .collect()
    assert(flaggedAfter.isEmpty,
      s"post-takedown gate must not flag removed content: ${flaggedAfter.toSeq}")

    // ingest RESUMES from the same checkpoint: 80 more batches,
    // including the two post-takedown replays of the removed word
    layBatches(root, 80, rowsFor, offset = 120)
    val q2 = graft.streaming.DedupStream.startDocStream(
      spark, in, stateDir, s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q2.awaitTermination(600000), "phase-2 soak did not drain")

    // state shape survived the mid-soak rewrite: still exactly one
    // sets partition per micro-batch across both phases
    val setParts = new java.io.File(s"$stateDir/sets").listFiles()
      .count(_.getName.startsWith("batch_id="))
    assert(setParts == 200, s"expected 200 sets partitions, got $setParts")

    val served = graft.streaming.DedupStream.servedDupPairs(spark, stateDir)
      .collect().toSeq
    // nothing resurrects the removed docs
    val removedSet = removed.toSet
    assert(served.forall(r =>
        !removedSet(r.getLong(0)) && !removedSet(r.getLong(1))),
      "a served pair touches a taken-down doc id")
    // re-encountered content pairs among its POST-takedown copies only
    // (batch 120's doc 241 with batch 130's doc 261)
    assert(served.exists(r => r.getLong(0) == 241L && r.getLong(1) == 261L
        || r.getLong(0) == 261L && r.getLong(1) == 241L),
      "post-takedown replays of the removed word must pair with each other")
    // ...and the whole served relation equals the one-shot x02 over
    // exactly the surviving corpus
    val oneShot = DedupOps.dedupMinhashLshOf(
        spark.read.parquet(in).select($"doc_id", $"text")
          .filter(!$"doc_id".isin(removed: _*)))
      .collect().toSeq
    assert(served == oneShot,
      s"served ${served.length} pairs != one-shot-over-survivors ${oneShot.length}")
  }
}
