package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.SearchOps

/** The BM25 inverted index maintained INCREMENTALLY under ingest —
  * the serving index (x33b's shape) kept current per micro-batch
  * instead of rebuilt corpus-wide: each batch of (append-only)
  * documents contributes its own postings partial and one stats row,
  * partitioned by (batch_id, term-bucket). Documents are disjoint
  * across batches, so the union of retained postings IS the retained
  * window's postings relation — exact, like the report card's algebra
  * and unlike the HLL estimates — and serving reads only the query
  * terms' bucket directories within each retained batch.
  *
  * REPLAY SAFETY: dynamic partition overwrite keyed by batch_id (the
  * CMS/HLL/report discipline) — an at-least-once replay rewrites its
  * own partitions instead of double-counting a batch's postings.
  * Retention = dropping a batch_id partition from both tables, which
  * removes exactly those documents from every df/tf/stat the scorer
  * reads — SearchRetentionSpec pins serve ≡ scan-form recompute of the
  * retained window. */
object SearchStream {

  private val postingsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("term", StringType),
      StructField("tf", LongType),
      StructField("dl", LongType),
      StructField("batch_id", LongType),
      StructField("tb", IntegerType)))
  }

  private val statsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("n_docs", LongType),
      StructField("sum_dl", LongType),
      StructField("batch_id", LongType)))
  }

  /** One micro-batch of documents: tokenize once, land the batch's
    * stats row and its postings (bucketed like the static index) into
    * the batch's own partitions. */
  def processPostingsBatch(batch: DataFrame, stateDir: String,
                           batchId: Long): Unit = {
    val toks = SearchOps.tokenizedOf(batch).localCheckpoint(false)
    SearchOps.statsOf(toks)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$stateDir/stats")
    SearchOps.postingsOf(toks)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "tb").parquet(s"$stateDir/postings")
  }

  /** Start the index-maintenance stream over a parquet file-drop of
    * documents (AvailableNow = drain-and-stop; a 24/7 deployment uses
    * a processing-time trigger). */
  def startPostingsStream(spark: SparkSession, inputDir: String,
                          stateDir: String, checkpointDir: String,
                          maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    StateMaintenance.startFileDropStream(spark, inputDir, checkpointDir,
      maxFilesPerTrigger) { (batch, batchId) =>
      processPostingsBatch(batch, stateDir, batchId)
    }


  /** BM25 for the fixed query over the RETAINED window: corpus stats
    * re-add across surviving batch partitions, the hits scan prunes to
    * the query terms' buckets within each batch, and scoring is the
    * shared x33/x33b arithmetic — so the answer equals the scan form
    * run over exactly the retained documents. */
  def servedBm25(spark: SparkSession, stateDir: String): DataFrame = {
    val tbs = SearchOps.QueryTerms.map(SearchOps.termBucketJvm).distinct
    val stats0 = StateMaintenance.readOr(spark, s"$stateDir/stats", statsSchema)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    val hits = StateMaintenance.readOr(spark, s"$stateDir/postings", postingsSchema)
      .filter(col("tb").isin(tbs: _*) &&
        col("term").isin(SearchOps.QueryTerms: _*))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))
    SearchOps.scoreFromHits(hits, stats0)
  }

  /** x64's fusion served ENTIRELY from incrementally-maintained state:
    * the lexical leg from this stream's postings partials, the dense
    * leg from AnnStream's bucket partials — the same `fuseRrf`
    * arithmetic as the batch-index form, so hybrid retrieval stays
    * fresh under ingest without ever rebuilding either index
    * (spec-pinned equal to the batch x64 over the same corpus). */
  def servedHybrid(spark: SparkSession, searchStateDir: String,
                   annStateDir: String, probeE: Seq[Double],
                   excludeId: Long = -1L): DataFrame =
    SearchOps.fuseRrf(
      servedBm25(spark, searchStateDir),
      AnnStream.servedAnnLsh(spark, annStateDir, probeE, excludeId))
}
