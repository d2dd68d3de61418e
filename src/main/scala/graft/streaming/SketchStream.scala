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

  // ---- streaming HLL overlap (x34's sketch, incremental) -----------------

  /** State layout: per-half Datasketches HLL binaries, one pair per
    * micro-batch, partitioned by batch_id. Unlike the additive CMS
    * counters, HLL partials merge by register MAX (hll_union_agg):
    * idempotent, so a replayed batch could not inflate the estimate
    * even WITHOUT the partition overwrite — and retention-by-dropping
    * old batch partitions leaves exactly the sketch of the retained
    * window (the union over the remaining partials IS that window's
    * sketch, not an approximation of a subtraction). */
  private val overlapSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("half", StringType),
      StructField("sk", BinaryType),
      StructField("batch_id", LongType)))
  }

  /** One micro-batch of documents: per-half HLL partials, overwritten
    * into the batch's own batch_id partition (same replay rule as the
    * CMS partials). */
  def processOverlapBatch(batch: DataFrame, stateDir: String,
                          batchId: Long): Unit =
    SketchOps.halfShinglesOf(batch)
      .groupBy(col("half")).agg(hll_sketch_agg(col("sh")).as("sk"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(stateDir)

  /** Incremental corpus-overlap monitoring over a documents file-drop:
    * the streaming form of x34b. Each micro-batch contributes KB-sized
    * sketch objects; the overlap of everything seen so far is pure
    * sketch algebra over the state table — no batch ever reprocesses
    * history. */
  def startOverlapStream(spark: SparkSession, inputDir: String,
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
        processOverlapBatch(batch, stateDir, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** (est_a, est_b, est_union, est_overlap) from the retained batch
    * partials: union across batches per half, union across halves for
    * the total — the same inclusion-exclusion x34 validates in batch.
    * Empty/absent state reads as zero estimates. */
  def mergedOverlap(spark: SparkSession, stateDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base =
      if (fs.exists(p)) spark.read.schema(overlapSchema).parquet(stateDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], overlapSchema)
    base.groupBy(col("half")).agg(hll_union_agg(col("sk")).as("sk"))
      .agg(
        coalesce(max(when(col("half") === "a",
          hll_sketch_estimate(col("sk")))), lit(0L)).as("est_a"),
        coalesce(max(when(col("half") === "b",
          hll_sketch_estimate(col("sk")))), lit(0L)).as("est_b"),
        coalesce(hll_sketch_estimate(hll_union_agg(col("sk"))), lit(0L))
          .as("est_union"))
      .withColumn("est_overlap",
        col("est_a") + col("est_b") - col("est_union"))
  }
}
