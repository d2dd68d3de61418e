package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.TextOps

/** The curation pipeline (x14's gates) as an INCREMENTAL streaming
  * pass — how a 100 TB corpus is curated in practice: documents arrive
  * as files, every gate is the same per-row column expression the
  * batch path uses (one shared definition, so batch and streaming can
  * never disagree), and exact dedup is streaming state keyed by the
  * order-invariant fingerprint.
  *
  * State note: `dropDuplicates("fp")` keeps one state entry per
  * distinct fingerprint. For a bounded backfill (`AvailableNow`) that
  * is exactly the dedup set and the right tool; a forever-running
  * deployment would bound it with `dropDuplicatesWithinWatermark` over
  * an arrival-time horizon, trading global dedup for bounded state —
  * the same trade the reference makes with its 300 s dedup TTL
  * (`insert-events-into-db.lua:39`, SURVEY W3). */
object DocCuration {

  /** Per-row curation projection — the single definition shared by the
    * batch x14 query and the stream below. */
  def curated(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        TextOps.fingerprintCol(col("text")).as("fp"),
        TextOps.langIdCol(col("text")).as("pred_lang"),
        round(TextOps.qualityCol(col("text")), 4).as("q"))
      .filter(col("pred_lang") === "en" && col("q") >= 0.4)

  /** Batch reference semantics: gates + keep the min doc_id per
    * fingerprint (deterministic representative). */
  def curateBatch(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    curated(docs)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Streaming curation over a parquet file-drop directory: gates →
    * stateful fingerprint dedup → append sink. `AvailableNow`
    * processes the current backlog and stops (W5 backfill shape). */
  def startCuration(spark: SparkSession, inputDir: String, outDir: String,
                    checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(inputDir).schema
    val docs = spark.readStream.schema(schema).parquet(inputDir)
    curated(docs)
      .dropDuplicates(Seq("fp"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
