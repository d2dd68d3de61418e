package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance for the batch_id-partitioned partial-state tables
  * (CMS counters, HLL overlap sketches, report-card partials): after a
  * long retention window the state accumulates one partition per
  * micro-batch, and while the MERGED view stays correct at any
  * partition count, thousands of tiny directories are an operational
  * cost (listing, open-per-file) every merge pays. Compaction folds
  * all partials with batch_id ≤ upTo into ONE partial stored at
  * batch_id = upTo; the merged view is unchanged because every state's
  * merge is associative (sums re-sum, HLL unions re-union, extrema
  * re-extreme) — the compacted partial is just a pre-merged prefix.
  *
  * SAFETY CONTRACT (documented, spec-pinned):
  *  - Call with upTo ≤ the stream's last COMMITTED batch id. foreachBatch
  *    replays target only uncommitted ids, so a replay can never
  *    overwrite a compacted prefix.
  *  - The fold is not atomic across the overwrite and the deletes. A
  *    `_graft_compacting` marker written first makes the operation
  *    RECOVERABLE: if a previous compaction died mid-way, the next
  *    `compactBatches` call on the dir finishes its deletes before
  *    doing anything else. Readers between a crash and the recovery
  *    may double-count the prefix — run compaction from the single
  *    maintenance process that owns the state dir (the same ownership
  *    the stream's checkpoint already implies), as parquet compaction
  *    jobs do everywhere.
  */
object StateMaintenance {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Read a state artifact with its declared schema, or an empty frame
    * when the directory does not exist yet — the one definition every
    * partial-state consumer (postings, ANN, dedup) shares, so
    * first-serve-before-first-batch behaves identically everywhere. */
  def readOr(spark: SparkSession, dir: String,
             schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (fs(spark, dir).exists(p)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** The shared file-drop maintenance-stream skeleton: schema-sniffed
    * parquet readStream → foreachBatch(processor) → AvailableNow
    * (drain-and-stop; a 24/7 deployment swaps in a processing-time
    * trigger). One definition so the trigger/checkpoint discipline of
    * every incremental index (postings, ANN, dedup) changes in one
    * place. */
  def startFileDropStream(spark: SparkSession, inputDir: String,
                          checkpointDir: String,
                          maxFilesPerTrigger: Option[Int])(
      processor: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = spark.read.parquet(inputDir).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(processor)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  private def batchPartitions(spark: SparkSession,
                              dir: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
      .map(st => (st.getPath.getName.stripPrefix("batch_id=").toLong, st.getPath))
  }

  private def marker(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_graft_compacting")

  /** Read the marker's upTo if a previous compaction died mid-way. */
  private def pendingUpTo(spark: SparkSession, dir: String): Option[Long] = {
    val f = fs(spark, dir)
    if (!f.exists(marker(dir))) None
    else {
      val in = f.open(marker(dir))
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Finish an interrupted compaction: the merged prefix already lives
    * at batch_id = upTo (it is written before the marker's deletes
    * begin), so recovery = delete the remaining strictly-older
    * partitions and drop the marker. */
  private def recover(spark: SparkSession, dir: String): Unit =
    pendingUpTo(spark, dir).foreach { upTo =>
      val f = fs(spark, dir)
      batchPartitions(spark, dir)
        .filter(_._1 < upTo)
        .foreach { case (_, path) => f.delete(path, true) }
      f.delete(marker(dir), true)
    }

  /** Fold every partial with batch_id ≤ upTo into one partial at
    * batch_id = upTo. `merge` re-aggregates the batch_id-stripped
    * partial rows into one partial row-set (the same associative
    * algebra the state's merged view applies); `extraPartitions` keeps
    * any further partition columns (e.g. the postings' term bucket).
    * No-op when ≤ 1 partition is in range. */
  def compactBatches(spark: SparkSession, stateDir: String, upTo: Long,
                     merge: DataFrame => DataFrame,
                     extraPartitions: Seq[String] = Seq.empty): Unit = {
    recover(spark, stateDir)
    val inRange = batchPartitions(spark, stateDir).filter(_._1 <= upTo)
    if (inRange.size > 1) {
      val f = fs(spark, stateDir)
      // materialize the merged prefix BEFORE touching the directory —
      // Spark refuses to overwrite a path it is still reading from,
      // and a crash before any mutation must leave the state untouched
      val merged = merge(
        spark.read.parquet(stateDir)
          .filter(col("batch_id") <= upTo).drop("batch_id"))
        .withColumn("batch_id", lit(upTo))
        .localCheckpoint(true)
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id" +: extraPartitions: _*)
        .parquet(stateDir)
      // marker AFTER the merged write: from here the fold is complete
      // at upTo and recovery only needs to finish the deletes
      val out = f.create(marker(stateDir), true)
      try out.write(upTo.toString.getBytes("UTF-8")) finally out.close()
      inRange.filter(_._1 < upTo)
        .foreach { case (_, path) => f.delete(path, true) }
      f.delete(marker(stateDir), true)
    }
  }

  private def removalMarker(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_graft_removing")

  /** Excise a set of doc_ids from a batch_id-partitioned state
    * artifact — the serving-path half of x57's removal propagation
    * (right-to-be-forgotten must reach the index, or the ingest gate
    * keeps matching content the corpus no longer holds). Only the
    * partitions that actually contain a removed doc are rewritten
    * (metadata-scale driver listing, same class as compaction's);
    * partitions left with zero survivors are deleted outright, since a
    * dynamic overwrite that writes no rows for a partition leaves its
    * old files in place.
    *
    * Takedown lists are driver-small by nature (ids arrive as a list,
    * not a relation), which also makes the operation RECOVERABLE the
    * simple way: the ids are persisted into a `_graft_removing` marker
    * BEFORE any mutation, and removal is idempotent (anti-join of an
    * already-clean partition rewrites it unchanged), so a crashed
    * removal is re-applied from the marker on the next call. Same
    * single-owner contract as compaction.
    *
    * `extraPartitions` keeps further partition columns (e.g. the band
    * index's `band`). Empty-partition cleanup is at batch granularity:
    * correct for artifacts where every doc fans out to every extra
    * partition (the band index — 32 keys per doc) or that have no
    * extra partitions (identity sets). */
  def removeDocs(spark: SparkSession, stateDir: String,
                 removedIds: Seq[Long],
                 extraPartitions: Seq[String] = Seq.empty): Unit = {
    val f = fs(spark, stateDir)
    if (!f.exists(new org.apache.hadoop.fs.Path(stateDir))) return
    // finish a crashed removal first (ids from its marker)
    if (f.exists(removalMarker(stateDir))) {
      val in = f.open(removalMarker(stateDir))
      val prior = try new String(in.readAllBytes(), "UTF-8").trim
        finally in.close()
      if (prior.nonEmpty)
        applyRemoval(spark, stateDir, prior.split("\n").map(_.toLong).toSeq,
          extraPartitions)
      f.delete(removalMarker(stateDir), true)
    }
    if (removedIds.isEmpty) return
    val out = f.create(removalMarker(stateDir), true)
    try out.write(removedIds.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    applyRemoval(spark, stateDir, removedIds, extraPartitions)
    f.delete(removalMarker(stateDir), true)
  }

  private def applyRemoval(spark: SparkSession, stateDir: String,
                           removedIds: Seq[Long],
                           extraPartitions: Seq[String]): Unit = {
    val f = fs(spark, stateDir)
    val state = spark.read.parquet(stateDir)
    // the partition column comes back as INT when directory names fit:
    // cast before collecting (the write below re-derives partitioning
    // from the frame, so keeping the original column type there is fine)
    val affected = state.filter(col("doc_id").isin(removedIds: _*))
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    if (affected.isEmpty) return
    // materialize survivors BEFORE mutating (Spark refuses to overwrite
    // a path it is reading; a crash before any mutation changes nothing)
    val survivors = state.filter(col("batch_id").isin(affected: _*))
      .filter(!col("doc_id").isin(removedIds: _*))
      .localCheckpoint(true)
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id" +: extraPartitions: _*)
      .parquet(stateDir)
    val still = survivors.select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    affected.filterNot(still).foreach(b =>
      f.delete(new org.apache.hadoop.fs.Path(stateDir, s"batch_id=$b"), true))
  }

  /** CMS counter state: partials re-ADD (SketchStream.mergedCounters'
    * algebra). */
  def compactCounters(spark: SparkSession, stateDir: String,
                      upTo: Long): Unit =
    compactBatches(spark, stateDir, upTo,
      _.groupBy(col("r"), col("pos")).agg(sum(col("cnt")).as("cnt")))

  /** HLL overlap state: partials re-UNION per half (register max —
    * idempotent, so compaction composes with replay trivially). */
  def compactOverlap(spark: SparkSession, stateDir: String,
                     upTo: Long): Unit =
    compactBatches(spark, stateDir, upTo,
      _.groupBy(col("half")).agg(hll_union_agg(col("sk")).as("sk")))

  /** Report-card state: the same per-source merge mergedReport applies
    * (sums add, extrema min/max). */
  def compactReport(spark: SparkSession, stateDir: String,
                    upTo: Long): Unit =
    compactBatches(spark, stateDir, upTo,
      _.groupBy(col("source"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("tokens")).as("tokens"),
          min(col("min_tokens")).as("min_tokens"),
          max(col("max_tokens")).as("max_tokens"),
          sum(col("n_en")).as("n_en"),
          sum(col("n_und")).as("n_und"),
          sum(col("total_q4")).as("total_q4")))

  /** BM25 postings state: documents are disjoint across batches, so
    * postings rows pass through unchanged (the fold only rewrites many
    * small partitions into one, keeping the term-bucket partitioning);
    * the stats table re-adds. */
  def compactPostings(spark: SparkSession, stateDir: String,
                      upTo: Long): Unit = {
    compactBatches(spark, s"$stateDir/postings", upTo,
      identity, extraPartitions = Seq("tb"))
    compactBatches(spark, s"$stateDir/stats", upTo,
      _.agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_dl")).as("sum_dl")))
  }
}
