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

  private val NMerges = 12

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
      val ((a, b), c) = counts.toSeq
        .minBy { case ((pa, pb), pc) => (-pc, pa, pb) }
      merges += ((r.toLong, a, b, c))
      vocab = vocab.map { case (w, (f, syms)) =>
        val out = collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == a && x == b)
            out(out.length - 1) = a + b
          else out += x
        }
        w -> ((f, out.toSeq))
      }
    }
    (merges.result(), vocab.map { case (w, (_, syms)) => w -> syms })
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

  test("segmentation joins the trained vocab; OOV words fall back to characters") {
    val (_, vocabDf) = BpeOps.bpeTrain(docs, NMerges)
    val probe = Seq((1L, "spark zzyzzx")).toDF("doc_id", "text")
    val got = BpeOps.bpeSegment(probe, vocabDf)
      .select($"word", $"syms").as[(String, Seq[String])].collect().toMap
    // in-vocab word gets its trained segmentation
    val trained = vocabDf.filter($"word" === "spark")
      .select($"syms").as[Seq[String]].collect()
    if (trained.nonEmpty) assert(got("spark") === trained.head)
    // OOV word: character fallback, still lossless
    assert(got("zzyzzx") === "zzyzzx".map(_.toString))
  }
}
