package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.streaming.DsirStream

/** The incrementally-maintained DSIR model: both distributions are
  * additive counts over a bounded hashed-feature space, so the served
  * log-ratio table must equal the one-shot x48 model bit for bit over
  * exactly the retained documents, under growth, replay, retention,
  * and a re-sum compaction. */
class DsirRetentionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text", $"lang")

  private def ratioRows(m: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    m.select($"b", $"lr6").as[(Long, Long)].collect().toSeq.sorted

  private def oneShot(dfs: org.apache.spark.sql.DataFrame*): Seq[(Long, Long)] =
    ratioRows(TextOps.dsirRatiosFromCounts(
      TextOps.dsirToksOf(dfs.reduce(_ union _))
        .groupBy($"b")
        .agg(count(lit(1)).as("ct_r"), count_if($"is_t").as("ct_t"))))

  private def served(state: String): Seq[(Long, Long)] =
    ratioRows(DsirStream.servedRatios(spark, state))

  test("streaming DSIR model: served ratio table equals the one-shot model; retention + re-sum compaction hold") {
    val root = java.nio.file.Files.createTempDirectory("graft-dsir-stream")
    val state = s"$root/state"
    assert(served(state).isEmpty)
    val b0 = docs.filter($"doc_id" % 3 === 0)
    val b1 = docs.filter($"doc_id" % 3 === 1)
    val b2 = docs.filter($"doc_id" % 3 === 2)
    DsirStream.processDocBatch(b0, state, 0L)
    DsirStream.processDocBatch(b1, state, 1L)
    DsirStream.processDocBatch(b2, state, 2L)
    val full = served(state)
    assert(full.nonEmpty)
    assert(full === oneShot(b0, b1, b2))
    // the merge is load-bearing: some bucket is counted in >1 batch
    val crossKeys = spark.read.parquet(s"$state/counts")
      .groupBy($"b").agg(countDistinct($"batch_id").as("nb"))
      .filter($"nb" >= 2).count()
    assert(crossKeys > 0)
    // scoring through the served table reproduces x48 end to end
    val viaStream = TextOps.dsirScore(
        TextOps.dsirToksOf(docs), DsirStream.servedRatios(spark, state))
      .select($"doc_id", $"n_toks", $"score6", $"selected")
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sorted
    val viaBatch = TextOps.dsirWeights(spark, sf)
      .select($"doc_id", $"n_toks", $"score6", $"selected")
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sorted
    assert(viaStream === viaBatch)
    // replay no-op
    DsirStream.processDocBatch(b1, state, 1L)
    assert(served(state) === full)
    // retention: drop batch 0 → the model retrains itself on b1 ∪ b2
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$state/counts", "batch_id=0"), true))
    assert(served(state) === oneShot(b1, b2))
    // compaction preserves the served model
    DsirStream.compact(spark, state, 2L)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/counts"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch_id=")).toSet
    assert(dirs === Set("batch_id=2"))
    assert(served(state) === oneShot(b1, b2))
  }

  test("streaming DSIR model: the file-drop stream lands every batch partition") {
    val root = java.nio.file.Files.createTempDirectory("graft-dsir-drop")
    val in = s"$root/in"
    docs.repartition(3).write.parquet(in)
    val q = DsirStream.startDocStream(spark, in, s"$root/state",
      s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    assert(served(s"$root/state") === oneShot(docs))
  }
}
