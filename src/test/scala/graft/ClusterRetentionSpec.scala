package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.streaming.ClusterStream

/** The incrementally-maintained x17 cluster-label relation: after every
  * micro-batch the served labels must equal `dedupClustersOf` over all
  * docs landed so far — including the hard case, a batch that MERGES
  * components formed in different earlier batches (rep contraction +
  * touched-partition rewrite), plus replay idempotence and the
  * removal-closure path. */
class ClusterRetentionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  private def recompute(dfs: org.apache.spark.sql.DataFrame*): Seq[(Long, Long)] =
    DedupOps.dedupClustersOf(dfs.reduce(_ union _))
      .as[(Long, Long)].collect().toSeq

  private def served(state: String): Seq[(Long, Long)] =
    ClusterStream.servedLabels(spark, state)
      .as[(Long, Long)].collect().toSeq

  test("streaming labels: served equals one-shot x17 under growth + replay") {
    val root = java.nio.file.Files.createTempDirectory("graft-cc-stream")
    val state = s"$root/state"
    assert(served(state).isEmpty)
    val b0 = docs.filter($"doc_id" % 3 === 0)
    val b1 = docs.filter($"doc_id" % 3 === 1)
    val b2 = docs.filter($"doc_id" % 3 === 2)
    ClusterStream.processClusterBatch(b0, state, 0L)
    assert(served(state) === recompute(b0))
    ClusterStream.processClusterBatch(b1, state, 1L)
    assert(served(state) === recompute(b0, b1))
    ClusterStream.processClusterBatch(b2, state, 2L)
    val full = served(state)
    assert(full === recompute(b0, b1, b2))
    // the fixture genuinely exercises cross-batch clustering: some
    // cluster must span two landing batches
    val byRep = full.groupBy(_._2).values
    assert(byRep.exists(c => c.map(_._1 % 3).distinct.size > 1),
      "fixture should contain a cluster spanning batches")
    // replay: re-running a committed batch is a no-op
    ClusterStream.processClusterBatch(b1, state, 1L)
    assert(served(state) === full)
    // compaction: folding the prefix changes nothing served, and the
    // stream keeps working on top of the compacted state
    ClusterStream.compact(spark, state, 2L)
    assert(served(state) === full)
    val extra = Seq((9000L, (1 to 50).map(i => s"ctok$i").mkString(" ")))
      .toDF("doc_id", "text")
    ClusterStream.processClusterBatch(extra, state, 3L)
    assert(served(state) === recompute(b0, b1, b2, extra))
  }

  test("crash window: death after the partials commit, before the label commit, recovers on replay") {
    // processClusterBatch commits three writes: sets, bands, then ONE
    // dynamic overwrite for labels (landing + merge-rewritten
    // partitions together). The only crash window left is between the
    // partials and the label commit: the index already contains the
    // batch's bands, the labels don't know the batch. Construct that
    // exact state — run the batch fully, then restore the PRE-BATCH
    // label tree — and prove the checkpoint-driven replay converges.
    val root = java.nio.file.Files.createTempDirectory("graft-cc-crash")
    val state = s"$root/state"
    val b0 = docs.filter($"doc_id" % 3 === 0)
    val b1 = docs.filter($"doc_id" % 3 === 1)
    ClusterStream.processClusterBatch(b0, state, 0L)
    val preCrash = served(state)
    // snapshot the pre-batch labels, run batch 1, restore the snapshot
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val labels = new org.apache.hadoop.fs.Path(s"$state/labels")
    val saved = new org.apache.hadoop.fs.Path(s"$root/labels-snapshot")
    org.apache.hadoop.fs.FileUtil.copy(fs, labels, fs, saved, false, true,
      spark.sparkContext.hadoopConfiguration)
    ClusterStream.processClusterBatch(b1, state, 1L)
    fs.delete(labels, true)
    org.apache.hadoop.fs.FileUtil.copy(fs, saved, fs, labels, false, true,
      spark.sparkContext.hadoopConfiguration)
    // the torn state is observable exactly as documented: partials
    // carry batch 1, served labels still answer the pre-batch view
    assert(served(state) === preCrash)
    // the replay (same batch, same id — what the streaming checkpoint
    // re-drives after the crash) self-heals: self-pairs are filtered,
    // duplicate edges are harmless to min-label, and the overwrite
    // lands the batch's labels idempotently
    ClusterStream.processClusterBatch(b1, state, 1L)
    assert(served(state) === recompute(b0, b1))
  }

  test("streaming labels: a later batch merges components across batches") {
    // A (batch 0) and B (batch 1) share too little to pair with each
    // other (jaccard 40/56 < 0.8) but C (batch 2) pairs with BOTH
    // (40/48 >= 0.8): landing C must weld two single-doc components
    // from DIFFERENT earlier partitions into one cluster — the rep
    // remap has to rewrite a non-landing partition (B's rep falls from
    // its own id to A's)
    val root = java.nio.file.Files.createTempDirectory("graft-cc-merge")
    val state = s"$root/state"
    val base = (1 to 40).map(i => s"mtok$i").mkString(" ")
    val a = Seq((1000L, base + " " + (1 to 8).map(i => s"atail$i").mkString(" ")))
      .toDF("doc_id", "text")
    val b = Seq((2000L, base + " " + (1 to 8).map(i => s"btail$i").mkString(" ")))
      .toDF("doc_id", "text")
    val c = Seq((3000L, base)).toDF("doc_id", "text")
    ClusterStream.processClusterBatch(a, state, 0L)
    ClusterStream.processClusterBatch(b, state, 1L)
    assert(served(state) === Seq((1000L, 1000L), (2000L, 2000L)),
      "A and B must start as separate components")
    ClusterStream.processClusterBatch(c, state, 2L)
    assert(served(state) ===
      Seq((1000L, 1000L), (2000L, 1000L), (3000L, 1000L)))
    assert(served(state) === recompute(a, b, c))
  }

  test("streaming labels: a removal closure reaches the served labels") {
    val root = java.nio.file.Files.createTempDirectory("graft-cc-forget")
    val state = s"$root/state"
    val b0 = docs.filter($"doc_id" % 2 === 0)
    val b1 = docs.filter($"doc_id" % 2 === 1)
    ClusterStream.processClusterBatch(b0, state, 0L)
    ClusterStream.processClusterBatch(b1, state, 1L)
    // take down one member of a real multi-doc cluster; the closure is
    // its whole cluster (x57 semantics), so surviving labels must equal
    // a recompute over the survivors
    val labels = served(state)
    val cluster = labels.groupBy(_._2).values.find(_.size > 1).get
    val closure = labels.filter(_._2 == cluster.head._2).map(_._1)
    ClusterStream.applyRemovals(spark, state, closure)
    val survivors = docs.filter(!$"doc_id".isin(closure: _*))
    assert(served(state) === recompute(survivors))
    assert(served(state).map(_._1).toSet.intersect(closure.toSet).isEmpty)
  }

  test("takedown between batches: both orders converge to their ground truth") {
    // The A/B/C merge construction again (A~C and B~C pair, A!~B), but
    // now a takedown of B interleaves with the merge batch C. The two
    // orders are DIFFERENT requests with DIFFERENT ground truths —
    // what must hold is that each converges to the one-shot recompute
    // over exactly the docs its closure leaves behind:
    //  - takedown BEFORE the merge batch: the closure (computed from
    //    pre-merge labels) is B alone; C then lands and must weld with
    //    A only — B's removed sets/bands must NOT feed a stale edge,
    //    and B must never resurface.
    //  - merge BEFORE the takedown: the closure must honor the
    //    POST-MERGE component (x57 semantics: the unit of deletion is
    //    the listed doc's whole near-dup cluster as currently known),
    //    sweeping A and C with B.
    val base = (1 to 40).map(i => s"ttok$i").mkString(" ")
    val a = Seq((1000L, base + " " + (1 to 8).map(i => s"atail$i").mkString(" ")))
      .toDF("doc_id", "text")
    val b = Seq((2000L, base + " " + (1 to 8).map(i => s"btail$i").mkString(" ")))
      .toDF("doc_id", "text")
    val c = Seq((3000L, base)).toDF("doc_id", "text")

    // order 1: takedown lands between batch 1 (B) and batch 2 (C)
    val root1 = java.nio.file.Files.createTempDirectory("graft-cc-tdm")
    val s1 = s"$root1/state"
    ClusterStream.processClusterBatch(a, s1, 0L)
    ClusterStream.processClusterBatch(b, s1, 1L)
    val closure1 = served(s1).filter(_._2 == 2000L).map(_._1)
    assert(closure1 === Seq(2000L), "pre-merge closure is B alone")
    ClusterStream.applyRemovals(spark, s1, closure1)
    ClusterStream.processClusterBatch(c, s1, 2L)
    assert(served(s1) === Seq((1000L, 1000L), (3000L, 1000L)))
    assert(served(s1) === recompute(a, c))

    // order 2: the merge batch lands first, then the same takedown
    val root2 = java.nio.file.Files.createTempDirectory("graft-cc-mtd")
    val s2 = s"$root2/state"
    ClusterStream.processClusterBatch(a, s2, 0L)
    ClusterStream.processClusterBatch(b, s2, 1L)
    ClusterStream.processClusterBatch(c, s2, 2L)
    val repOfB = served(s2).find(_._1 == 2000L).get._2
    val closure2 = served(s2).filter(_._2 == repOfB).map(_._1).sorted
    assert(closure2 === Seq(1000L, 2000L, 3000L),
      "post-merge closure must sweep the welded component")
    ClusterStream.applyRemovals(spark, s2, closure2)
    assert(served(s2).isEmpty)
  }
}
