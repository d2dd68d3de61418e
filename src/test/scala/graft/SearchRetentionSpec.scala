package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SearchOps
import graft.streaming.SearchStream

/** The incrementally-maintained BM25 index: per-batch postings/stats
  * partials must serve the SAME answer as the scan form over the same
  * documents (df, avgdl, and every rounded contribution included), and
  * retention by dropping a batch partition must leave exactly the
  * retained window's retrieval — scores recomputed against the
  * retained corpus's statistics, not stale ones. */
class SearchRetentionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private type Hit = (Long, Double, Long)

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[Hit] =
    df.as[Hit].collect().toSeq

  test("streaming postings: served BM25 equals the scan form; retention exact") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-bm25-stream")
    val state = s"$root/state"
    // empty state serves an empty result, not a path error
    assert(SearchStream.servedBm25(spark, state).count() === 0)
    val docs = Tables.documents(spark, sf)
    val Seq(b0, b1, b2) = (0 to 2).map(i => docs.filter($"doc_id" % 3 === i))
    SearchStream.processPostingsBatch(b0, state, 0L)
    SearchStream.processPostingsBatch(b1, state, 1L)
    SearchStream.processPostingsBatch(b2, state, 2L)
    // full window == the scan form over the whole corpus (x33 itself)
    assert(hits(SearchStream.servedBm25(spark, state))
      === hits(SearchOps.bm25Search(spark, sf)))
    // replay: rewriting one batch's partitions is a no-op
    SearchStream.processPostingsBatch(b1, state, 1L)
    assert(hits(SearchStream.servedBm25(spark, state))
      === hits(SearchOps.bm25Search(spark, sf)))
    // retention: drop batch 0 from BOTH tables → the served answer is
    // the scan form over exactly the retained documents (df/avgdl/N
    // all shift — a stale-stats bug fails this, not just a missing-doc
    // bug)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$state/postings/batch_id=0"), true))
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$state/stats/batch_id=0"), true))
    assert(hits(SearchStream.servedBm25(spark, state))
      === hits(SearchOps.bm25SearchOf(b1.union(b2))))
  }

  test("streaming hybrid: fusion over streamed state equals batch x64") {
    // land the documents in the search stream and the embeddings in
    // the ANN stream, then fuse from the SERVED state — the hybrid
    // composition must equal the batch-index x64 over the same corpus
    // (vec 0 is the probe and excluded from its own leg, exactly as
    // annLsh does)
    import java.nio.file.Files
    import graft.streaming.AnnStream
    val root = Files.createTempDirectory("graft-hybrid-stream")
    val (sState, aState) = (s"$root/search", s"$root/ann")
    val docs = Tables.documents(spark, sf)
    SearchStream.processPostingsBatch(
      docs.filter($"doc_id" % 2 === 0), sState, 0L)
    SearchStream.processPostingsBatch(
      docs.filter($"doc_id" % 2 === 1), sState, 1L)
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    AnnStream.processVectorBatch(emb.filter($"vec_id" % 2 === 0), aState, 0L)
    AnnStream.processVectorBatch(emb.filter($"vec_id" % 2 === 1), aState, 1L)
    val probe = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].head()
    val served = SearchStream
      .servedHybrid(spark, sState, aState, probe, excludeId = 0L)
      .as[(Long, Double, Option[Long], Option[Long])].collect().toSeq
    val batch = SearchOps.hybridRrf(spark, sf)
      .as[(Long, Double, Option[Long], Option[Long])].collect().toSeq
    assert(served === batch)
    assert(served.nonEmpty)
  }

  test("streaming postings end-to-end: file-drop stream builds the index") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-bm25-e2e")
    val in = s"$root/in"
    val docs = Tables.documents(spark, sf)
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.parquet(in)
    docs.filter($"doc_id" % 2 =!= 0).coalesce(1).write.mode("append").parquet(in)
    val q = SearchStream.startPostingsStream(
      spark, in, s"$root/state", s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    assert(hits(SearchStream.servedBm25(spark, s"$root/state"))
      === hits(SearchOps.bm25Search(spark, sf)))
  }
}
