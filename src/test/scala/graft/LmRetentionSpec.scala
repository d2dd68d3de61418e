package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.streaming.LmStream

/** The incrementally-maintained bigram-LM model: the model is a corpus
  * property, but c(w1,w2) is an additive count, so Σ of per-batch
  * partials over disjoint documents is the corpus count — the served
  * scoring table must equal the one-shot build's over exactly the
  * retained documents, bit for bit (integer arithmetic end to end),
  * under growth, replay, retention, and a re-sum compaction. */
class LmRetentionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  private def modelRows(m: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    m.select($"w1", $"w2", $"sp").as[(Long, Long, Long)]
      .collect().toSeq.sorted

  private def oneShot(dfs: org.apache.spark.sql.DataFrame*): Seq[(Long, Long, Long)] =
    modelRows(TextOps.lmModelFromCounts(
      TextOps.bigramsOfFrame(dfs.reduce(_ union _))
        .groupBy($"w1", $"w2").agg(count("*").as("c12"))))

  private def served(state: String): Seq[(Long, Long, Long)] =
    modelRows(LmStream.servedModel(spark, state))

  test("streaming LM model: served scoring table equals the one-shot build; retention + re-sum compaction hold") {
    val root = java.nio.file.Files.createTempDirectory("graft-lm-stream")
    val state = s"$root/state"
    assert(served(state).isEmpty)
    val b0 = docs.filter($"doc_id" % 3 === 0)
    val b1 = docs.filter($"doc_id" % 3 === 1)
    val b2 = docs.filter($"doc_id" % 3 === 2)
    LmStream.processDocBatch(b0, state, 0L)
    LmStream.processDocBatch(b1, state, 1L)
    LmStream.processDocBatch(b2, state, 2L)
    val full = served(state)
    assert(full.nonEmpty)
    assert(full === oneShot(b0, b1, b2))
    // the merged-partial property must be LOAD-BEARING: some bigram
    // occurs in more than one batch, so its corpus count (and score)
    // is visible to no single batch's partial
    val crossKeys = spark.read.parquet(s"$state/c12")
      .groupBy($"w1", $"w2")
      .agg(countDistinct($"batch_id").as("nb"))
      .filter($"nb" >= 2).count()
    assert(crossKeys > 0, "fixture should repeat bigrams across batches")
    // scoring through the served model matches scoring through the
    // one-shot artifact path on the same corpus (x27's serve shape)
    val viaStream = TextOps.lmScore(docs, LmStream.servedModel(spark, state))
      .select($"doc_id", $"n_bigrams", $"sum_scaled_p", $"flagged")
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sorted
    val viaBatch = TextOps.lmLikelihood(spark, sf)
      .select($"doc_id", $"n_bigrams", $"sum_scaled_p", $"flagged")
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sorted
    assert(viaStream === viaBatch)
    // replay: rewriting a batch's partition is a no-op
    LmStream.processDocBatch(b1, state, 1L)
    assert(served(state) === full)
    // retention: drop batch 0 — the remaining partials are exactly the
    // retained corpus's counts, so the model retrains itself
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$state/c12", "batch_id=0"), true))
    assert(served(state) === oneShot(b1, b2))
    // compaction: re-sum fold preserves the served model
    LmStream.compact(spark, state, 2L)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/c12"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch_id=")).toSet
    assert(dirs === Set("batch_id=2"))
    assert(served(state) === oneShot(b1, b2))
  }

  test("streaming LM model: the file-drop stream lands every batch partition") {
    val root = java.nio.file.Files.createTempDirectory("graft-lm-drop")
    val in = s"$root/in"
    docs.repartition(3).write.parquet(in)
    val q = LmStream.startDocStream(spark, in, s"$root/state",
      s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    assert(served(s"$root/state") === oneShot(docs))
  }
}
