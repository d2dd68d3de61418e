package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TextOps

/** The DSIR importance model (x48) maintained INCREMENTALLY under
  * ingest — the LmStream shape applied to the data-selection scorer:
  * both of the model's distributions are plain additive counts over a
  * bounded hashed-feature space, so over append-only batches with
  * disjoint documents the per-batch (bucket, raw-count, target-count)
  * rows are mergeable partials and Σ per-batch counts IS the corpus
  * model. The state is one batch_id-partitioned partial table:
  *
  *  - `counts/`: (b, ct_r, ct_t) PARTITIONED BY batch_id — the
  *               batch's raw/target feature counts, fused in one
  *               aggregate over ≤ DsirBuckets keys.
  *
  * Serving re-sums the partials per bucket and derives the log-ratio
  * table with the one-shot query's own algebra
  * (`TextOps.dsirRatiosFromCounts`), so the served ratio table equals
  * the batch x48 model bit for bit over exactly the retained
  * documents. Retention = partition drop; compaction = re-sum. The
  * deployment pattern: counts land per batch; the ratio table is
  * snapshot periodically (or derived on demand — it is ≤ DsirBuckets
  * rows) and broadcast to score each new ingest batch. */
object DsirStream {

  private val countsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("b", LongType),
      StructField("ct_r", LongType),
      StructField("ct_t", LongType),
      StructField("batch_id", LongType)))
  }

  /** One micro-batch of (doc_id, text, lang) rows: land the batch's
    * fused raw/target bucket counts as a mergeable partial. */
  def processDocBatch(batch: DataFrame, stateDir: String,
                      batchId: Long): Unit =
    TextOps.dsirToksOf(batch)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("ct_r"), count_if(col("is_t")).as("ct_t"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$stateDir/counts")

  /** Start the maintenance stream over a parquet file-drop of
    * documents (AvailableNow = drain-and-stop). */
  def startDocStream(spark: SparkSession, inputDir: String,
                     stateDir: String, checkpointDir: String,
                     maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    StateMaintenance.startFileDropStream(spark, inputDir, checkpointDir,
      maxFilesPerTrigger) { (batch, batchId) =>
      processDocBatch(batch.select(col("doc_id"), col("text"), col("lang")),
        stateDir, batchId)
    }

  /** The retained window's log-ratio table, derived from the merged
    * count partials by the one-shot query's own integer algebra. */
  def servedRatios(spark: SparkSession, stateDir: String): DataFrame =
    TextOps.dsirRatiosFromCounts(
      StateMaintenance.readOr(spark, s"$stateDir/counts", countsSchema)
        .groupBy(col("b"))
        .agg(sum(col("ct_r")).as("ct_r"), sum(col("ct_t")).as("ct_t")))

  /** Fold a committed prefix: count partials RE-SUM per bucket. */
  def compact(spark: SparkSession, stateDir: String, upTo: Long): Unit =
    StateMaintenance.compactBatches(spark, s"$stateDir/counts", upTo,
      _.groupBy(col("b"))
        .agg(sum(col("ct_r")).as("ct_r"), sum(col("ct_t")).as("ct_t")))
}
