package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.streaming.AnnStream

/** The incrementally-maintained ANN-LSH index: batch-partitioned
  * bucket assignments must serve exactly what the in-memory multiprobe
  * search answers over the same vectors, under growth, retention, and
  * compaction — a vector's bucket never depends on the rest of the
  * corpus, so the index needs no rebuild for any of the three. */
class AnnRetentionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def inMemory(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    SimilarityOps.annLshFrame(spark, df).as[(Long, Double)].collect().toSeq

  private def emb = Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding")

  private lazy val probeE: Seq[Double] = Tables.embeddings(spark, sf)
    .filter($"vec_id" === 0)
    .select($"embedding".cast("array<double>"))
    .as[Seq[Double]].head()

  private def served(state: String): Seq[(Long, Double)] =
    AnnStream.servedAnnLsh(spark, state, probeE, excludeId = 0L)
      .as[(Long, Double)].collect().toSeq

  test("streaming ANN: served equals in-memory; retention + compaction hold") {
    val root = java.nio.file.Files.createTempDirectory("graft-ann-stream")
    val state = s"$root/state"
    // empty state answers empty, not a path error
    assert(served(state).isEmpty)
    // vec 0 (the in-memory probe) lands in batch 1 so batch-0 retention
    // keeps it in the equivalence frame
    val b0 = emb.filter($"vec_id" % 3 === 2)
    val b1 = emb.filter($"vec_id" % 3 === 0)
    val b2 = emb.filter($"vec_id" % 3 === 1)
    AnnStream.processVectorBatch(b0, state, 0L)
    AnnStream.processVectorBatch(b1, state, 1L)
    AnnStream.processVectorBatch(b2, state, 2L)
    def frame(dfs: org.apache.spark.sql.DataFrame*) =
      dfs.reduce(_ union _)
        .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    assert(served(state) === inMemory(frame(b0, b1, b2)))
    // replay: rewriting a batch's partitions is a no-op
    AnnStream.processVectorBatch(b2, state, 2L)
    assert(served(state) === inMemory(frame(b0, b1, b2)))
    // retention: drop batch 0 → the index IS the remaining corpus's
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(state, "batch_id=0"), true))
    assert(served(state) === inMemory(frame(b1, b2)))
    // compaction: fold the remaining prefix — answers unchanged
    AnnStream.compactVectors(spark, state, 2L)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(state))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch_id=")).toSet
    assert(dirs === Set("batch_id=2"))
    assert(served(state) === inMemory(frame(b1, b2)))
  }

  test("streaming ANN: the file-drop stream lands every batch partition") {
    val root = java.nio.file.Files.createTempDirectory("graft-ann-drop")
    val in = s"$root/in"
    emb.repartition(3).write.parquet(in)
    val q = AnnStream.startVectorStream(spark, in, s"$root/state",
      s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    assert(served(s"$root/state") ===
      inMemory(emb.select($"vec_id",
        $"embedding".cast("array<double>").as("e"))))
  }
}
