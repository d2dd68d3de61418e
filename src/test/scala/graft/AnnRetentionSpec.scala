package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.streaming.AnnStream

/** The incrementally-maintained ANN-LSH index: batch-partitioned
  * bucket assignments must serve exactly what the in-memory multiprobe
  * search answers over the same vectors, under growth, retention, and
  * compaction — a vector's bucket never depends on the rest of the
  * corpus, so the index needs no rebuild for any of the three. */
class AnnRetentionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def inMemory(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    SimilarityOps.annLshFrame(spark, df).as[(Long, Double)].collect().toSeq

  private def emb = Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding")

  private lazy val probeE: Seq[Double] = Tables.embeddings(spark, sf)
    .filter($"vec_id" === 0)
    .select($"embedding".cast("array<double>"))
    .as[Seq[Double]].head()

  private def served(state: String): Seq[(Long, Double)] =
    AnnStream.servedAnnLsh(spark, state, probeE, excludeId = 0L)
      .as[(Long, Double)].collect().toSeq

  test("streaming ANN: served equals in-memory; retention + compaction hold") {
    val root = java.nio.file.Files.createTempDirectory("graft-ann-stream")
    val state = s"$root/state"
    // empty state answers empty, not a path error
    assert(served(state).isEmpty)
    // vec 0 (the in-memory probe) lands in batch 1 so batch-0 retention
    // keeps it in the equivalence frame
    val b0 = emb.filter($"vec_id" % 3 === 2)
    val b1 = emb.filter($"vec_id" % 3 === 0)
    val b2 = emb.filter($"vec_id" % 3 === 1)
    AnnStream.processVectorBatch(b0, state, 0L)
    AnnStream.processVectorBatch(b1, state, 1L)
    AnnStream.processVectorBatch(b2, state, 2L)
    def frame(dfs: org.apache.spark.sql.DataFrame*) =
      dfs.reduce(_ union _)
        .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    assert(served(state) === inMemory(frame(b0, b1, b2)))
    // replay: rewriting a batch's partitions is a no-op
    AnnStream.processVectorBatch(b2, state, 2L)
    assert(served(state) === inMemory(frame(b0, b1, b2)))
    // retention: drop batch 0 → the index IS the remaining corpus's
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(state, "batch_id=0"), true))
    assert(served(state) === inMemory(frame(b1, b2)))
    // compaction: fold the remaining prefix — answers unchanged
    AnnStream.compactVectors(spark, state, 2L)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(state))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch_id=")).toSet
    assert(dirs === Set("batch_id=2"))
    assert(served(state) === inMemory(frame(b1, b2)))
  }

  test("streaming ANN ingest gate: served equals the cross slice of one-shot x05") {
    import graft.operators.DedupOps
    val root = java.nio.file.Files.createTempDirectory("graft-ann-gate")
    val state = s"$root/state"
    val b0 = emb.filter($"vec_id" % 3 === 2)
    val b1 = emb.filter($"vec_id" % 3 === 0)
    // the candidate batch: the fixture's third split PLUS exact copies
    // of three held vectors under new ids — guarantees the gate has
    // real near-dups to find (cosine 1, hamming 0 — caught by
    // construction), on top of whatever the fixture slices share
    val copies = emb.filter($"vec_id".isin(0L, 3L, 6L))
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding")
    val batch = emb.filter($"vec_id" % 3 === 1).union(copies)

    // expected: one-shot x05 over (held ∪ batch), cross pairs only,
    // oriented (new_id, dup_of)
    def frame(dfs: org.apache.spark.sql.DataFrame*) =
      dfs.reduce(_ union _)
        .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    def expected(held: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] = {
      val batchIds = batch.select($"vec_id").as[Long].collect().toSet
      DedupOps.dedupEmbeddingFrame(spark, frame(held, batch))
        .as[(Long, Long, Double)].collect()
        .filter { case (a, b, _) => batchIds(a) ^ batchIds(b) }
        .map { case (a, b, s) =>
          if (batchIds(a)) (a, b, s) else (b, a, s) }
        .toSet
    }
    def gate(): Set[(Long, Long, Double)] =
      AnnStream.servedIncomingNearDups(spark, state, batch)
        .as[(Long, Long, Double)].collect().toSet

    // empty state answers empty, not a path error
    assert(gate().isEmpty)
    AnnStream.processVectorBatch(b0, state, 0L)
    AnnStream.processVectorBatch(b1, state, 1L)
    val full = expected(b0.union(b1))
    assert(full.nonEmpty, "the crafted copies must collide with their originals")
    assert(gate() === full)
    // the gate is batch-vs-corpus only: no within-batch pairs leak in
    // (copies of vec_id 0/3/6 land in the batch together with nothing
    // similar of their own) — implied by === but pinned explicitly
    val batchIds = batch.select($"vec_id").as[Long].collect().toSet
    assert(gate().forall { case (n, o, _) => batchIds(n) && !batchIds(o) })
    // replay: rewriting a batch's partitions is a no-op
    AnnStream.processVectorBatch(b1, state, 1L)
    assert(gate() === full)
    // retention: drop batch 0 → the gate compares against what remains
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(state, "batch_id=0"), true))
    assert(gate() === expected(b1))
    // compaction: answers unchanged
    AnnStream.compactVectors(spark, state, 1L)
    assert(gate() === expected(b1))
  }

  test("streaming ANN: the file-drop stream lands every batch partition") {
    val root = java.nio.file.Files.createTempDirectory("graft-ann-drop")
    val in = s"$root/in"
    emb.repartition(3).write.parquet(in)
    val q = AnnStream.startVectorStream(spark, in, s"$root/state",
      s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    assert(served(s"$root/state") ===
      inMemory(emb.select($"vec_id",
        $"embedding".cast("array<double>").as("e"))))
  }

  test("crash window: mid-stream death after the batch lands, before its commit — gate identical across replay") {
    // the GhScoringStreamSpec discipline applied to the ANN ingest
    // gate: the driver dies AFTER processVectorBatch wrote batch 1's
    // (batch_id, bucket) partitions but BEFORE the checkpoint commit
    // acknowledged the offset — the exact window a foreachBatch sink
    // must survive. On restart batch 1 REPLAYS; the dynamic partition
    // overwrite rewrites the same partitions (vector rows are disjoint
    // across batches, so replay is idempotent by construction), and
    // both the index serve and the ingest gate answer identically to
    // a run that never crashed.
    val root = java.nio.file.Files.createTempDirectory("graft-ann-crash")
    val (in, state, ckpt) = (s"$root/in", s"$root/state", s"$root/ckpt")
    emb.repartition(3).write.parquet(in)

    // the gate's probe batch: new ids copying held vectors, so the
    // gate has guaranteed near-dups to find on both sides of the crash
    val copies = emb.filter($"vec_id".isin(0L, 3L, 6L))
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding")
    def gate(): Set[(Long, Long, Double)] =
      AnnStream.servedIncomingNearDups(spark, state, copies)
        .as[(Long, Long, Double)].collect().toSet

    val seen = scala.collection.mutable.LinkedHashMap[Long, Set[Long]]()
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(expectFail: Boolean): Unit = {
      val schema = spark.read.parquet(in).schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
          AnnStream.processVectorBatch(df, state, bid)
          seen(bid) = df.select(col("vec_id")).as[Long].collect().toSet
          // die AFTER the state write, BEFORE the commit
          if (bid == 1L && crashOnce.getAndSet(false))
            throw new RuntimeException("simulated driver crash")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      if (expectFail)
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.awaitTermination(120000); q.stop()
          throw new AssertionError("batch 1 must fail this run")
        }
      else assert(q.awaitTermination(120000))
    }
    run(expectFail = true)    // batch 0 commits; batch 1 lands, dies uncommitted
    assert(seen.keySet === Set(0L, 1L))

    // the crash-window state is already CONSISTENT, not corrupt: batch
    // 1's landed-but-unacknowledged partitions serve exactly as if the
    // batch had committed (disjoint rows — nothing half-applied)
    // + vec 0: annLshFrame derives its probe from the frame (and
    // excludes it from results, as served does via excludeId) — the
    // random file split may have put vec 0 in the not-yet-run batch 2
    val landedIds = seen(0L) ++ seen(1L) + 0L
    val landedFrame = emb.filter($"vec_id".isInCollection(landedIds))
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    assert(served(state) === inMemory(landedFrame))
    val gateAtCrash = gate()
    assert(gateAtCrash.nonEmpty, "the planted copies must already collide")

    run(expectFail = false)   // fresh "driver": batch 1 replays, batch 2 runs
    assert(seen.keySet === Set(0L, 1L, 2L))

    // replay did not duplicate: every vec_id holds exactly one state row
    val stateRows = spark.read.parquet(state)
    assert(stateRows.count() === stateRows.select("vec_id").distinct().count())
    // batch 1's replayed partition carries its original batch_id
    assert(stateRows.filter(col("vec_id").isInCollection(seen(1L)))
      .select("batch_id").distinct().as[Long].collect().toSeq === Seq(1L))

    // the recovered index serves exactly the in-memory answer over ALL
    // vectors, and the gate's pre-crash pairs survive verbatim inside
    // the recovered gate (batch 2 only ADDS candidates)
    assert(served(state) === inMemory(
      emb.select($"vec_id", $"embedding".cast("array<double>").as("e"))))
    val gateRecovered = gate()
    assert(gateAtCrash.subsetOf(gateRecovered),
      "pairs served during the crash window must be identical after replay")

    // and the recovered gate equals a NEVER-CRASHED build of the same
    // corpus — the end-to-end equivalence the crash must not dent
    val cleanState = s"$root/state_clean"
    AnnStream.processVectorBatch(emb, cleanState, 0L)
    val gateClean = AnnStream.servedIncomingNearDups(spark, cleanState, copies)
      .as[(Long, Long, Double)].collect().toSet
    assert(gateRecovered === gateClean)
  }
}
