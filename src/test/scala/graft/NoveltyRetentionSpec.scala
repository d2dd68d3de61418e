package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupOps
import graft.streaming.NoveltyStream

/** The incremental x78 novelty scores: per-batch distinct (doc_id, sh)
  * partials must compose to the exact one-shot scores under growth,
  * replay, batch-granular retention, and compaction — and retention
  * must RAISE survivors' novelty where a dropped batch held the only
  * other copy of a shingle (novelty is corpus-relative; the state is
  * pairs, not scores, precisely so the serve recounts ownership). */
class NoveltyRetentionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private type Row4 = (Long, Long, Long, Long)

  private def scores(df: org.apache.spark.sql.DataFrame): Seq[Row4] =
    df.as[Row4].collect().toSeq

  private def exactOf(docs: org.apache.spark.sql.DataFrame): Seq[Row4] =
    scores(DedupOps.noveltyScoresOf(docs.select($"doc_id", $"text")))

  test("streamed novelty equals one-shot x78 over the drained corpus") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-novelty-stream")
    val in = s"$root/in"
    val docs = Tables.documents(spark, sf)
    docs.filter($"doc_id" % 3 === 0).coalesce(1).write.parquet(in)
    docs.filter($"doc_id" % 3 === 1).coalesce(1).write.mode("append").parquet(in)
    docs.filter($"doc_id" % 3 === 2).coalesce(1).write.mode("append").parquet(in)
    // pre-first-batch serve answers empty, not an error
    assert(NoveltyStream.servedNovelty(spark, s"$root/state").count() === 0)
    val q = NoveltyStream.startNoveltyStream(
      spark, in, s"$root/state", s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    assert(scores(NoveltyStream.servedNovelty(spark, s"$root/state"))
      === scores(DedupOps.noveltyScores(spark, sf)))
  }

  test("replay, retention, and compaction recount ownership exactly") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-novelty-retain")
    val state = s"$root/state"
    val docs = Tables.documents(spark, sf)
    val Seq(b0, b1, b2) = (0 to 2).map(i => docs.filter($"doc_id" % 3 === i))
    NoveltyStream.processNoveltyBatch(b0, state, 0L)
    NoveltyStream.processNoveltyBatch(b1, state, 1L)
    NoveltyStream.processNoveltyBatch(b2, state, 2L)
    assert(scores(NoveltyStream.servedNovelty(spark, state)) === exactOf(docs))
    // replay: rewriting a batch partition changes nothing
    NoveltyStream.processNoveltyBatch(b1, state, 1L)
    assert(scores(NoveltyStream.servedNovelty(spark, state)) === exactOf(docs))
    // retention is exact AND corpus-relative: dropping batch 0 serves
    // x78 over batches 1∪2 — any surviving doc whose duplicate copy
    // lived in batch 0 gains novelty because ownership is recounted
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$state/docpairs", "batch_id=0"), true))
    val retained = exactOf(b1.union(b2))
    assert(scores(NoveltyStream.servedNovelty(spark, state)) === retained)
    // the relativity property BITES on the fixture: at least one
    // retained doc's novelty differs between the full and retained
    // corpora (a cross-batch duplicate lost its other copy)
    val before = exactOf(docs).map(r => r._1 -> r._4).toMap
    assert(retained.exists(r => before.get(r._1).exists(_ != r._4)),
      "retention should change some surviving doc's novelty")
    // compaction folds the prefix without changing the served view
    NoveltyStream.compact(spark, state, 2L)
    assert(spark.read.parquet(s"$state/docpairs")
      .select($"batch_id").distinct().count() === 1)
    assert(scores(NoveltyStream.servedNovelty(spark, state)) === retained)
  }
}
