package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BpeOps
import graft.streaming.BpeStream

/** The incrementally-maintained BPE vocabulary: word frequency is an
  * additive count, so Σ of per-batch partials over disjoint documents
  * is the corpus vocabulary — and a tokenizer retrained from the
  * served vocab must equal a from-scratch train over exactly the
  * retained documents, merge for merge, under growth, replay,
  * retention, and a re-sum compaction. */
class BpeRetentionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val NMerges = 6

  private def docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  private def vocabRows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    df.select($"word", $"freq").as[(String, Long)].collect().toSeq.sorted

  private def trainRows(merges: org.apache.spark.sql.DataFrame,
                        vocab: org.apache.spark.sql.DataFrame)
      : (Seq[(Long, String, String, Long)], Seq[(String, Seq[String])]) =
    (merges.select($"round", $"a", $"b", $"n")
       .as[(Long, String, String, Long)].collect().toSeq.sorted,
     vocab.select($"word", $"syms")
       .as[(String, Seq[String])].collect().toSeq.sortBy(_._1))

  test("streaming BPE vocab: served vocabulary and retrained tokenizer equal the one-shot build; retention + compaction hold") {
    val root = java.nio.file.Files.createTempDirectory("graft-bpe-stream")
    val state = s"$root/state"
    assert(vocabRows(BpeStream.servedVocab(spark, state)).isEmpty)
    val b0 = docs.filter($"doc_id" % 3 === 0)
    val b1 = docs.filter($"doc_id" % 3 === 1)
    val b2 = docs.filter($"doc_id" % 3 === 2)
    BpeStream.processDocBatch(b0, state, 0L)
    BpeStream.processDocBatch(b1, state, 1L)
    BpeStream.processDocBatch(b2, state, 2L)
    val full = vocabRows(BpeStream.servedVocab(spark, state))
    assert(full.nonEmpty)
    assert(full === vocabRows(BpeOps.vocabOf(docs)))
    // the merged-partial property must be LOAD-BEARING: some word
    // lands in more than one batch, so its corpus freq is visible to
    // no single partial
    val crossKeys = spark.read.parquet(s"$state/vocab")
      .groupBy($"word").agg(countDistinct($"batch_id").as("nb"))
      .filter($"nb" >= 2).count()
    assert(crossKeys > 0, "fixture should repeat words across batches")
    // retraining from the maintained state ≡ a from-scratch train on
    // the same corpus, merge for merge and segmentation for
    // segmentation (training's corpus stage IS the vocab aggregate)
    val (sm, sv) = BpeStream.trainFromState(spark, state, NMerges) match {
      case (m, v) => trainRows(m, v)
    }
    val (bm, bv) = BpeOps.bpeTrain(docs, NMerges) match {
      case (m, v) => trainRows(m, v)
    }
    assert(sm === bm)
    assert(sv === bv)
    // replay: rewriting a batch's partition is a no-op
    BpeStream.processDocBatch(b1, state, 1L)
    assert(vocabRows(BpeStream.servedVocab(spark, state)) === full)
    // retention: drop batch 0 — the rest are the retained corpus
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$state/vocab", "batch_id=0"), true))
    val retained = docs.filter($"doc_id" % 3 =!= 0)
    assert(vocabRows(BpeStream.servedVocab(spark, state)) ===
      vocabRows(BpeOps.vocabOf(retained)))
    // compaction: re-sum fold preserves the served vocab and the train
    BpeStream.compact(spark, state, 2L)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/vocab"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch_id=")).toSet
    assert(dirs === Set("batch_id=2"))
    assert(vocabRows(BpeStream.servedVocab(spark, state)) ===
      vocabRows(BpeOps.vocabOf(retained)))
    val (cm, _) = BpeStream.trainFromState(spark, state, NMerges) match {
      case (m, v) => trainRows(m, v)
    }
    val (rm, _) = BpeOps.bpeTrain(retained, NMerges) match {
      case (m, v) => trainRows(m, v)
    }
    assert(cm === rm)
  }

  test("streaming BPE vocab: the file-drop stream lands every batch partition") {
    val root = java.nio.file.Files.createTempDirectory("graft-bpe-drop")
    val in = s"$root/in"
    docs.repartition(3).write.parquet(in)
    val q = BpeStream.startDocStream(spark, in, s"$root/state",
      s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    assert(vocabRows(BpeStream.servedVocab(spark, s"$root/state")) ===
      vocabRows(BpeOps.vocabOf(docs)))
  }
}
