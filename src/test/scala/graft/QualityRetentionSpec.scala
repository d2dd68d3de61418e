package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.streaming.QualityStream

/** The incremental per-source quality thresholds: additive integer
  * histograms must serve the EXACT x70 percentile (bit for bit — the
  * interpolation replicates Spark's Percentile), and retention by
  * batch-partition drop must leave exactly the retained window's
  * thresholds. */
class QualityRetentionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private type GateRow = (Long, String, Long)

  private def gate(df: org.apache.spark.sql.DataFrame): Seq[GateRow] =
    df.as[GateRow].collect().toSeq

  test("streamed thresholds gate exactly like one-shot x70") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-quality-stream")
    val in = s"$root/in"
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text")
    docs.filter($"doc_id" % 3 === 0).coalesce(1).write.parquet(in)
    docs.filter($"doc_id" % 3 === 1).coalesce(1).write.mode("append").parquet(in)
    docs.filter($"doc_id" % 3 === 2).coalesce(1).write.mode("append").parquet(in)
    // pre-first-batch serve answers an empty gate, not an error
    assert(QualityStream.servedThresholds(spark, s"$root/state").count() === 0)
    val q = QualityStream.startQualityStream(
      spark, in, s"$root/state", s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    // the served gate equals the exact per-source percentile gate
    assert(gate(QualityStream.servedGate(spark, sf, s"$root/state"))
      === gate(TextOps.qualityGate(spark, sf)))
  }

  test("replay, retention, and compaction preserve the exact thresholds") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-quality-retain")
    val state = s"$root/state"
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text")
    val Seq(b0, b1, b2) = (0 to 2).map(i => docs.filter($"doc_id" % 3 === i))
    QualityStream.processQualityBatch(b0, state, 0L)
    QualityStream.processQualityBatch(b1, state, 1L)
    QualityStream.processQualityBatch(b2, state, 2L)
    // full window
    assert(gate(QualityStream.servedGate(spark, sf, state))
      === gate(TextOps.qualityGateOf(docs)))
    // replay: rewriting a batch partition changes nothing
    QualityStream.processQualityBatch(b1, state, 1L)
    assert(gate(QualityStream.servedGate(spark, sf, state))
      === gate(TextOps.qualityGateOf(docs)))
    // retention: drop batch 0 → thresholds (and the gate over the
    // retained docs) are EXACTLY the recompute over batches 1∪2
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(state, "batch_id=0"), true))
    val retained = b1.union(b2)
    val scoredRetained = retained
      .select($"doc_id", $"source", $"text")
    def scoreOf(d: org.apache.spark.sql.DataFrame) = {
      graft.plans.GraftExpressions.register(spark)
      d.select($"doc_id", $"source",
        round(TextOps.qualityCol($"text") * 1e6, 0).cast("long").as("q_micro"))
    }
    assert(gate(TextOps.gateWith(scoreOf(scoredRetained),
        QualityStream.servedThresholds(spark, state)))
      === gate(TextOps.qualityGateOf(retained)))
    // compaction folds the prefix without changing the served view
    QualityStream.compact(spark, state, 2L)
    assert(spark.read.parquet(state)
      .select($"batch_id").distinct().count() === 1)
    assert(gate(TextOps.gateWith(scoreOf(scoredRetained),
        QualityStream.servedThresholds(spark, state)))
      === gate(TextOps.qualityGateOf(retained)))
  }
}
