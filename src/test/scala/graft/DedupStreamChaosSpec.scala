package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.streaming.DedupStream

/** Crash-recovery chaos for the streaming dedup index state dirs
  * (VERDICT r16 #6): the takedown soak proves resume-from-checkpoint,
  * but nothing forced a kill BETWEEN a sets-partition write and the
  * checkpoint commit. This spec kills exactly there via the
  * ArtifactChaosSpec seam style and pins that the replayed batch —
  * re-executed under the SAME batch_id because the offset never
  * committed — OVERWRITES the half-written partition instead of
  * double-counting it. */
class DedupStreamChaosSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  test("a kill between the sets-partition write and the checkpoint commit doesn't double-count on replay") {
    val root = java.nio.file.Files.createTempDirectory("graft-dedup-kill")
    val in = s"$root/in"
    val state = s"$root/state"
    val ckpt = s"$root/ckpt"
    docs.repartition(3).write.parquet(in)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def part(art: String, bid: Long) =
      new org.apache.hadoop.fs.Path(s"$state/$art/batch_id=$bid")

    // drive 1: batch 1's sets partition lands, then the process "dies"
    // before the bands write and before the checkpoint commit
    DedupStream.onSetsWritten = bid =>
      if (bid == 1L) throw new RuntimeException("chaos: killed mid-commit")
    try {
      val q1 = DedupStream.startDocStream(spark, in, state, ckpt,
        maxFilesPerTrigger = Some(1))
      val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.awaitTermination(120000)
      }
      assert(died.getMessage.contains("killed mid-commit") ||
        Option(died.getCause).exists(_.getMessage.contains("killed mid-commit")))
    } finally DedupStream.onSetsWritten = _ => ()

    // the crash window is real: sets/batch_id=1 exists (half-written
    // state), bands/batch_id=1 does not, and the offset didn't commit
    assert(fs.exists(part("sets", 1L)),
      "the kill must land AFTER the sets partition write")
    assert(!fs.exists(part("bands", 1L)),
      "the kill must land BEFORE the bands write")

    // drive 2: restart from the SAME checkpoint — Structured Streaming
    // replays the uncommitted batch under the SAME batch_id
    val q2 = DedupStream.startDocStream(spark, in, state, ckpt,
      maxFilesPerTrigger = Some(1))
    assert(q2.awaitTermination(120000))

    // no double count anywhere: each doc's identity set landed exactly
    // once (the replay OVERWROTE the half-written partition), and both
    // artifacts agree batch for batch
    val sets = spark.read.parquet(s"$state/sets")
    assert(sets.groupBy($"doc_id").count().filter($"count" > 1).count() === 0,
      "a replayed batch must overwrite its partition, not append to it")
    assert(sets.select($"doc_id").as[Long].collect().sorted.toSeq ===
      docs.select($"doc_id").as[Long].collect().sorted.toSeq)
    val bands = spark.read.parquet(s"$state/bands")
    assert(bands.select($"batch_id").distinct().as[Long].collect().toSet ===
      sets.select($"batch_id").distinct().as[Long].collect().toSet)
    // each doc carries exactly its 32 band keys — the bands artifact
    // was not double-written either
    assert(bands.groupBy($"doc_id").count().filter($"count" =!= 32).count() === 0)

    // and the SERVED answer over the recovered state is the one-shot
    // x02 over the full corpus — bitwise
    val served = DedupStream.servedDupPairs(spark, state)
      .as[(Long, Long, Double)].collect().toSeq
    val oneShot = DedupOps.dedupMinhashLshOf(docs)
      .as[(Long, Long, Double)].collect().toSeq
    assert(served === oneShot)
    assert(served.nonEmpty, "fixture should contain near-dup pairs")
  }
}
