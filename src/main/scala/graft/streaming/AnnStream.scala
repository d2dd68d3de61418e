package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{CoreQueries, SimilarityOps}

/** The ANN-LSH index maintained INCREMENTALLY under ingest — the x06
  * serving index kept current per micro-batch of new vectors: a
  * vector's LSH bucket is a pure function of the vector (independent
  * of the rest of the corpus, unlike IVF centroids), so each batch's
  * bucket assignments are final the moment they land, the union of
  * retained partitions IS the retained corpus's index, and a probe
  * still reads only its multiprobe buckets within each batch.
  *
  * Same partial-state discipline as the postings/card/sketch streams:
  * (batch_id, bucket)-partitioned, replay-safe dynamic overwrite,
  * retention = batch-partition drop, compaction =
  * StateMaintenance.compactBatches with the identity merge (vector
  * rows are disjoint across batches, like postings). */
object AnnStream {

  private val stateSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("vec_id", LongType),
      StructField("e", ArrayType(DoubleType)),
      StructField("batch_id", LongType),
      StructField("bucket", IntegerType)))
  }

  /** One micro-batch of (vec_id, embedding) rows: signature each
    * vector (the x06 codegen expression) and land it in its
    * (batch_id, bucket) partition. */
  def processVectorBatch(batch: DataFrame, stateDir: String,
                         batchId: Long): Unit = {
    val s = batch.sparkSession
    batch
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("bucket",
        SimilarityOps.lshSignature(s, col("e")).cast("int"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "bucket").parquet(stateDir)
  }

  /** Start the index-maintenance stream over a parquet file-drop of
    * embedding rows (AvailableNow = drain-and-stop). */
  def startVectorStream(spark: SparkSession, inputDir: String,
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
        processVectorBatch(batch, stateDir, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** ANN top-K for a probe vector already in the state, served from
    * the retained partitions: the probe's stored bucket explodes to
    * its multiprobe keys and equi-joins the (batch, bucket)-partitioned
    * state — identical candidate rule (and therefore identical
    * answers) to the in-memory annLshFrame over exactly the retained
    * vectors, which is what the retention spec pins. */
  def servedAnnLsh(spark: SparkSession, stateDir: String,
                   probeId: Long = 0L): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state =
      if (fs.exists(p)) spark.read.schema(stateSchema).parquet(stateDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    val probe = state.filter(col("vec_id") === probeId)
      .select(col("e").as("qe"),
        explode(array(SimilarityOps.ProbeMasks.map(m =>
          col("bucket").bitwiseXOR(lit(m.toInt))): _*)).as("bucket"))
    state.join(broadcast(probe), "bucket")
      .filter(col("vec_id") =!= probeId)
      .select(col("vec_id"),
        round(CoreQueries.cosine(spark, col("e"), col("qe")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(SimilarityOps.TopK)
  }

  /** Fold a committed prefix of batches into one partition (vector
    * rows are disjoint across batches — identity merge, bucket
    * partitioning preserved). */
  def compactVectors(spark: SparkSession, stateDir: String,
                     upTo: Long): Unit =
    StateMaintenance.compactBatches(spark, stateDir, upTo,
      identity, extraPartitions = Seq("bucket"))
}
