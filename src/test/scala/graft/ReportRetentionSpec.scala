package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps
import graft.streaming.ReportStream

/** The incremental dataset card: per-batch partials must compose to
  * the EXACT batch card (x37's algebra is all counts/sums/extrema — no
  * approximation), and retention by dropping a batch partition must
  * leave exactly the retained window's card. This is the composition
  * SCALE.md claims for partial-state streaming: the merged view is a
  * pure function of the retained partials. */
class ReportRetentionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private type CardRow = (String, Long, Long, Long, Long, Long, Long, Long, Double)

  private def card(df: org.apache.spark.sql.DataFrame): Seq[CardRow] =
    df.as[CardRow].collect().toSeq

  private def exactCardOf(docs: org.apache.spark.sql.DataFrame): Seq[CardRow] =
    card(TextOps.finishReport(TextOps.reportPartialsOf(docs)))

  test("streaming card: merged partials equal the batch x37 bit-for-bit") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-card-stream")
    val in = s"$root/in"
    val docs = Tables.documents(spark, sf)
    // three file drops → micro-batches (maxFilesPerTrigger = 1)
    docs.filter($"doc_id" % 3 === 0).coalesce(1).write.parquet(in)
    docs.filter($"doc_id" % 3 === 1).coalesce(1).write.mode("append").parquet(in)
    docs.filter($"doc_id" % 3 === 2).coalesce(1).write.mode("append").parquet(in)
    // state that was never written answers an empty card, not an error
    assert(ReportStream.mergedReport(spark, s"$root/state").count() === 0)
    val q = ReportStream.startReportStream(
      spark, in, s"$root/state", s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    assert(spark.read.parquet(s"$root/state")
      .select($"batch_id").distinct().count() >= 2,
      "stream should have produced multiple batch partitions")
    // whichever file landed in whichever batch, the full window's
    // merged card is the exact corpus card
    assert(card(ReportStream.mergedReport(spark, s"$root/state"))
      === exactCardOf(spark.read.parquet(in)))
  }

  test("retention: dropping a batch partition leaves the retained card") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-card-retain")
    val state = s"$root/state"
    val docs = Tables.documents(spark, sf)
    val Seq(b0, b1, b2) = (0 to 2).map(i => docs.filter($"doc_id" % 3 === i))
    ReportStream.processReportBatch(b0, state, 0L)
    ReportStream.processReportBatch(b1, state, 1L)
    ReportStream.processReportBatch(b2, state, 2L)
    assert(card(ReportStream.mergedReport(spark, state)) === exactCardOf(docs))
    // replay safety: rewriting a batch's partition is a no-op
    ReportStream.processReportBatch(b1, state, 1L)
    assert(card(ReportStream.mergedReport(spark, state)) === exactCardOf(docs))
    // retention: drop batch 0's partition → the card is EXACTLY the
    // recompute over the retained window (batches 1 and 2), min/max
    // and averages included — not an approximation of a subtraction
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(state, "batch_id=0"), true))
    assert(card(ReportStream.mergedReport(spark, state))
      === exactCardOf(b1.union(b2)))
  }

  test("mixture planners served from the card equal the batch x36/x52/x55") {
    // the three mixture solves need only (source, tokens) — exactly a
    // projection of the incrementally-maintained card, so a deployment
    // re-plans its mixture after every ingest batch with NO corpus
    // scan; the card's token identity is x09's, the same one the batch
    // planners aggregate
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-card-mix")
    val state = s"$root/state"
    val docs = Tables.documents(spark, sf)
    (0 to 2).foreach(i =>
      ReportStream.processReportBatch(
        docs.filter($"doc_id" % 3 === i), state, i.toLong))
    val counts = ReportStream.mergedReport(spark, state)
      .select($"source", $"tokens")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    assert(rows(TextOps.mixtureFromCounts(counts))
      === rows(TextOps.mixturePlan(spark, sf)))
    assert(rows(TextOps.temperatureFromCounts(counts))
      === rows(TextOps.temperatureMixture(spark, sf)))
    assert(rows(TextOps.unimaxFromCounts(counts))
      === rows(TextOps.unimaxMixture(spark, sf)))
  }
}
