package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupOps
import graft.streaming.OverlapStream

/** The incremental x71 matrix: distinct-union partials must compose to
  * the exact one-shot matrix under growth, replay, batch-granular
  * retention, and compaction — set semantics make a pair contributed
  * by several batches survive the drop of any one of them. */
class OverlapRetentionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private type Row3 = (String, String, Long)

  private def matrix(df: org.apache.spark.sql.DataFrame): Seq[Row3] =
    df.as[Row3].collect().toSeq

  private def exactOf(docs: org.apache.spark.sql.DataFrame): Seq[Row3] =
    matrix(DedupOps.overlapMatrixFrom(DedupOps.sourcePairsOf(
      docs.select($"doc_id", $"source", $"text"))))

  test("streamed matrix equals one-shot x71 over the drained corpus") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-overlap-stream")
    val in = s"$root/in"
    val docs = Tables.documents(spark, sf)
    docs.filter($"doc_id" % 3 === 0).coalesce(1).write.parquet(in)
    docs.filter($"doc_id" % 3 === 1).coalesce(1).write.mode("append").parquet(in)
    docs.filter($"doc_id" % 3 === 2).coalesce(1).write.mode("append").parquet(in)
    // pre-first-batch serve answers an empty matrix, not an error
    assert(OverlapStream.servedMatrix(spark, s"$root/state").count() === 0)
    val q = OverlapStream.startOverlapStream(
      spark, in, s"$root/state", s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    assert(matrix(OverlapStream.servedMatrix(spark, s"$root/state"))
      === matrix(DedupOps.sourceOverlapMatrix(spark, sf)))
  }

  test("replay, retention, and compaction preserve set semantics") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-overlap-retain")
    val state = s"$root/state"
    val docs = Tables.documents(spark, sf)
    val Seq(b0, b1, b2) = (0 to 2).map(i => docs.filter($"doc_id" % 3 === i))
    OverlapStream.processOverlapBatch(b0, state, 0L)
    OverlapStream.processOverlapBatch(b1, state, 1L)
    OverlapStream.processOverlapBatch(b2, state, 2L)
    assert(matrix(OverlapStream.servedMatrix(spark, state)) === exactOf(docs))
    // replay: rewriting a batch partition changes nothing
    OverlapStream.processOverlapBatch(b1, state, 1L)
    assert(matrix(OverlapStream.servedMatrix(spark, state)) === exactOf(docs))
    // retention is batch-granular and EXACT: dropping batch 0 serves
    // the matrix of batches 1∪2 — pairs batch 0 shared with retained
    // batches survive via their own partials
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$state/srcpairs", "batch_id=0"), true))
    val retained = exactOf(b1.union(b2))
    assert(matrix(OverlapStream.servedMatrix(spark, state)) === retained)
    // compaction folds the prefix without changing the served view
    OverlapStream.compact(spark, state, 2L)
    assert(spark.read.parquet(s"$state/srcpairs")
      .select($"batch_id").distinct().count() === 1)
    assert(matrix(OverlapStream.servedMatrix(spark, state)) === retained)
  }
}
