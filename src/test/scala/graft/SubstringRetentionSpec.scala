package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.streaming.SubstringStream

/** The incrementally-maintained substring-dedup state: duplication is
  * a CORPUS property (unlike ANN buckets or band keys), but disjoint
  * append-only batches make the per-gram distinct-doc counts mergeable
  * partials — so served spans must equal the one-shot x43 span core
  * over exactly the retained documents, under growth, replay,
  * retention, and a compaction whose df merge is a real re-sum. */
class SubstringRetentionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  private def oneShot(dfs: org.apache.spark.sql.DataFrame*): Seq[(Long, Long, Int, Int)] =
    DedupOps.substringSpansOf(dfs.reduce(_ union _))
      .select($"doc_id", $"n_tokens", $"s", $"e")
      .as[(Long, Long, Int, Int)].collect().toSeq.sorted

  private def served(state: String): Seq[(Long, Long, Int, Int)] =
    SubstringStream.servedSpans(spark, state)
      .select($"doc_id", $"n_tokens", $"s", $"e")
      .as[(Long, Long, Int, Int)].collect().toSeq.sorted

  test("streaming substrings: served spans equal one-shot x43; retention + re-sum compaction hold") {
    val root = java.nio.file.Files.createTempDirectory("graft-substr-stream")
    val state = s"$root/state"
    assert(served(state).isEmpty)
    val b0 = docs.filter($"doc_id" % 3 === 0)
    val b1 = docs.filter($"doc_id" % 3 === 1)
    val b2 = docs.filter($"doc_id" % 3 === 2)
    SubstringStream.processDocBatch(b0, state, 0L)
    SubstringStream.processDocBatch(b1, state, 1L)
    SubstringStream.processDocBatch(b2, state, 2L)
    val full = served(state)
    assert(full.nonEmpty, "fixture should contain cross-doc duplicated substrings")
    assert(full === oneShot(b0, b1, b2))
    // a CROSS-batch duplication must be visible (the merged-df property:
    // no single batch can see it)
    val crossOnly = oneShot(b0, b1, b2).toSet --
      (oneShot(b0) ++ oneShot(b1) ++ oneShot(b2)).toSet
    assert(crossOnly.nonEmpty, "fixture should have cross-batch dups")
    assert(crossOnly.subsetOf(full.toSet))
    // replay: rewriting a batch's partitions is a no-op
    SubstringStream.processDocBatch(b1, state, 1L)
    assert(served(state) === full)
    // retention: drop batch 0 from BOTH artifacts
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (art <- Seq("grams", "df"))
      assert(fs.delete(
        new org.apache.hadoop.fs.Path(s"$state/$art", "batch_id=0"), true))
    assert(served(state) === oneShot(b1, b2))
    // compaction: identity fold for grams, RE-SUM fold for df partials
    SubstringStream.compact(spark, state, 2L)
    for (art <- Seq("grams", "df")) {
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/$art"))
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("batch_id=")).toSet
      assert(dirs === Set("batch_id=2"), art)
    }
    assert(served(state) === oneShot(b1, b2))
  }

  test("streaming substrings: the file-drop stream lands every batch partition") {
    val root = java.nio.file.Files.createTempDirectory("graft-substr-drop")
    val in = s"$root/in"
    docs.repartition(3).write.parquet(in)
    val q = SubstringStream.startDocStream(spark, in, s"$root/state",
      s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    assert(served(s"$root/state") === oneShot(docs))
  }
}
