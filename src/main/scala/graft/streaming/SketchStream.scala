package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.SketchOps

/** The count-min sketch (x29) as an INCREMENTAL stream — frequency
  * monitoring the way a 24/7 ingest runs it: each micro-batch
  * contributes its own d×w partial counter relation, and the sketch
  * for any horizon is the SUM of the partials. That additivity is the
  * whole point of CMS at scale: state is bounded (d·w rows per batch
  * partition, d·w after merge) no matter how many events flow, and
  * merging is a plain aggregate — no replay of history.
  *
  * REPLAY SAFETY: foreachBatch is at-least-once, so the partial write
  * is a dynamic partition overwrite keyed by batch_id — a replayed
  * batch rewrites its own partition instead of double-counting (the
  * same idempotence rule as the near-dup gate's band state and the
  * backfill's hour partitions). Retention = dropping old batch_id
  * partitions, which SUBTRACTS exactly those batches' counts — a
  * sliding-window sketch for free. */
object SketchStream {

  /** Counter-state layout: (r, pos, cnt) partitioned by batch_id. */
  private val stateSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("r", IntegerType),
      StructField("pos", LongType),
      StructField("cnt", LongType),
      StructField("batch_id", LongType)))
  }

  /** One micro-batch: build the batch's partial counters and overwrite
    * its batch_id partition of the state table. */
  def processSketchBatch(batch: DataFrame, stateDir: String,
                         batchId: Long): Unit =
    SketchOps.cmsCounters(
        batch.filter(col("user_id").isNotNull).select(col("user_id")))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(stateDir)

  /** Start the counter stream over a parquet file-drop of events.
    * `AvailableNow` drains the backlog and stops (the backfill shape);
    * a 24/7 deployment runs the same query with a processing-time
    * trigger. */
  def startHeavyHitterStream(spark: SparkSession, inputDir: String,
                             stateDir: String, checkpointDir: String,
                             maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val schema = spark.read.parquet(inputDir).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processSketchBatch(batch, stateDir, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The merged sketch over every retained batch partition — the d×w
    * relation `SketchOps.cmsEstimates` probes. Pinned schema: an empty
    * or file-less state dir reads as an empty (all-zero) sketch, and a
    * state dir that was NEVER created (no batch committed yet) returns
    * the same empty frame instead of a path error. */
  def mergedCounters(spark: SparkSession, stateDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base =
      if (fs.exists(p)) spark.read.schema(stateSchema).parquet(stateDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    base.groupBy(col("r"), col("pos")).agg(sum(col("cnt")).as("cnt"))
  }
}
