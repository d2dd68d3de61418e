package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{BpeOps, TextOps}

/** BPE training/application vs the classic sequential algorithm
  * (Sennrich et al.): the distributed trainer must pick the same merge
  * sequence and produce the same segmentations as a driver-side
  * reference fold over the same word-frequency table. */
class BpeTrainSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // Past round ~13 on this fixture some word ("scan") fully collapses
  // to a single symbol — training through 20 pins that converged words
  // are filtered, not crashed on (sequence(1,0) is DESCENDING in
  // Spark, so an unguarded pair-expand throws INVALID_INDEX_OF_ZERO).
  private val NMerges = 20

  private def docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  /** Classic BPE: count adjacent symbol pairs (overlaps included, the
    * get_stats convention), pick (count DESC, pair ASC), replace
    * greedily left-to-right; repeat. */
  private def refTrain(words: Map[String, Long], n: Int)
      : (Seq[(Long, String, String, Long)], Map[String, Seq[String]]) = {
    var vocab: Map[String, (Long, Seq[String])] =
      words.map { case (w, f) => w -> ((f, w.map(_.toString))) }
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (r <- 0 until n) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.values.foreach { case (f, syms) =>
        syms.sliding(2).filter(_.size == 2)
          .foreach(p => counts((p(0), p(1))) += f)
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq
          .minBy { case ((pa, pb), pc) => (-pc, pa, pb) }
        merges += ((r.toLong, a, b, c))
        vocab = vocab.map { case (w, (f, syms)) =>
          w -> ((f, refApply(syms, a, b)))
        }
      }
    }
    (merges.result(), vocab.map { case (w, (_, syms)) => w -> syms })
  }

  /** One greedy left-to-right merge pass. */
  private def refApply(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = collection.mutable.ArrayBuffer.empty[String]
    syms.foreach { x =>
      if (out.nonEmpty && out.last == a && x == b)
        out(out.length - 1) = a + b
      else out += x
    }
    out.toSeq
  }

  test("distributed BPE training picks the reference merge sequence and segmentations") {
    val (mergesDf, vocabDf) = BpeOps.bpeTrain(docs, NMerges)
    val gotMerges = mergesDf.select($"round", $"a", $"b", $"n")
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    val wordFreq = docs
      .select(explode(split(lower(trim($"text")), "\\s+")).as("word"))
      .filter(length($"word") >= 2)
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect().toMap
    val (wantMerges, wantVocab) = refTrain(wordFreq, NMerges)
    assert(gotMerges === wantMerges)
    // the trained merges must DO something on the fixture: at least
    // one multi-char symbol exists and some merge builds on another
    assert(wantMerges.exists { case (_, a, b, _) => (a + b).length > 2 },
      "fixture should chain merges (a merged symbol merging again)")
    val gotVocab = vocabDf.select($"word", $"syms")
      .as[(String, Seq[String])].collect().toMap
    assert(gotVocab === wantVocab)
    // segmentation is lossless: symbols concatenate back to the word
    gotVocab.foreach { case (w, syms) => assert(syms.mkString === w) }
    // round 0 reconciles against the x46 single-round audit's top row
    val x46Top = TextOps.bpePairs(spark, sf)
      .as[(String, Long)].collect().head
    assert((gotMerges.head._2 + gotMerges.head._3,
      gotMerges.head._4) === x46Top)
  }

  test("segmentation joins the trained vocab; OOV words get the learned merges applied") {
    val (mergesDf, vocabDf) = BpeOps.bpeTrain(docs, NMerges)
    val merges = mergesDf.select($"round", $"a", $"b")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val probe = Seq((1L, "spark zzyzzx")).toDF("doc_id", "text")
    val got = BpeOps.bpeSegment(probe, mergesDf, vocabDf)
      .select($"word", $"syms").as[(String, Seq[String])].collect().toMap
    // in-vocab word gets its trained segmentation
    val trained = vocabDf.filter($"word" === "spark")
      .select($"syms").as[Seq[String]].collect()
    if (trained.nonEmpty) assert(got("spark") === trained.head)
    // OOV word: the trained merges applied in pick order (Sennrich's
    // open-vocabulary application), NOT a bare character fallback —
    // recomputed here with the reference greedy pass
    val wantOov = merges.foldLeft("zzyzzx".map(_.toString): Seq[String]) {
      case (syms, (_, a, b)) => refApply(syms, a, b)
    }
    assert(got("zzyzzx") === wantOov)
    assert(got("zzyzzx").mkString === "zzyzzx")
  }

  test("the OOV merge fold reproduces the trained segmentation for every vocab word") {
    // segmenting with an EMPTY vocab forces every word down the OOV
    // path — it must agree with the trained vocab's segmentations
    // exactly (the application fold ≡ training's per-round passes)
    val (mergesDf, vocabDf) = BpeOps.bpeTrain(docs, NMerges)
    val viaOov = BpeOps.bpeSegment(docs, mergesDf, vocabDf.limit(0))
      .select($"word", $"syms").distinct()
      .as[(String, Seq[String])].collect().toMap
    val trained = vocabDf.select($"word", $"syms")
      .as[(String, Seq[String])].collect().toMap
    assert(viaOov === trained)
  }

  test("a converged corpus stops merging instead of annihilating the vocabulary") {
    // 'ab ab': round 0 merges (a,b); every later round finds NO pair —
    // the merge table must stop growing and the vocab must survive
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val (mergesDf, vocabDf) = BpeOps.bpeTrain(tiny, 3)
    assert(mergesDf.count() === 1L)
    val vocab = vocabDf.select($"word", $"syms")
      .as[(String, Seq[String])].collect().toMap
    assert(vocab === Map("ab" -> Seq("ab")))
    // and segmentation through the converged tokenizer still works
    val seg = BpeOps.bpeSegment(tiny, mergesDf, vocabDf)
      .select($"syms").as[Seq[String]].collect()
    assert(seg.toSeq === Seq(Seq("ab"), Seq("ab")))
  }
}
