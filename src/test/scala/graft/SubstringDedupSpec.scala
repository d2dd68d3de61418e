package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupOps

/** x43 exact-substring spans: the whole pipeline (k-gram marking, ≥2
  * distinct docs, island merge, per-doc budgets) is recomputed here in
  * plain driver-side Scala from the raw texts — independent of the
  * operator's explode/window/aggregate plan. */
class SubstringDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("x43: spans match a plain-Scala recompute; budgets are maximal-merged") {
    val k = DedupOps.SubstringGramK
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").toSeq
    }.filter(_._2.size >= k).toMap
    // gram string -> distinct docs containing it
    val gramDocs = toks.toSeq
      .flatMap { case (id, w) =>
        w.sliding(k).map(_.mkString(" ")).map(g => (g, id)).toSeq
      }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val expected = toks.toSeq.flatMap { case (id, w) =>
      val marked = w.sliding(k).zipWithIndex.collect {
        case (g, i) if gramDocs(g.mkString(" ")) >= 2 => i
      }.toSeq
      if (marked.isEmpty) Nil
      else {
        // merge overlapping windows [i, i+k-1] into maximal spans
        val spans = marked.foldLeft(List.empty[(Int, Int)]) {
          case (acc, i) =>
            val (s, e) = (i, i + k - 1)
            acc match {
              case (ps, pe) :: rest if s <= pe => (ps, math.max(pe, e)) :: rest
              case _ => (s, e) :: acc
            }
        }.reverse
        val dupTokens = spans.map { case (s, e) => e - s + 1 }.sum
        Seq((id, w.size.toLong, spans.size.toLong, dupTokens.toLong,
          BigDecimal(dupTokens.toDouble / w.size)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.sortBy(_._1)
    val got = DedupOps.dedupSubstrings(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty, "fixture should contain cross-doc duplicated substrings")
    assert(got === expected)
  }

  test("x44: surgical removal matches a plain-Scala excision, fingerprints included") {
    val k = DedupOps.SubstringGramK
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").toSeq
    }.filter(_._2.size >= k).toMap
    val gramDocs = toks.toSeq
      .flatMap { case (id, w) =>
        w.sliding(k).map(_.mkString(" ")).map(g => (g, id)).toSeq
      }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val expected = toks.toSeq.map { case (id, w) =>
      val covered = w.sliding(k).zipWithIndex.flatMap {
        case (g, i) if gramDocs(g.mkString(" ")) >= 2 => i until (i + k)
        case _ => Nil
      }.toSet
      val kept = w.zipWithIndex.collect {
        case (tok, i) if !covered(i) => tok
      }
      (id, w.size.toLong, kept.size.toLong, md5hex(kept.mkString(" ")))
    }.sortBy(_._1)
    val got = DedupOps.removeDupSpans(spark, sf)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === expected)
    assert(got.exists(_._3 == 0L), "whole-doc copies should clean to empty")
    // untouched docs keep their full text verbatim
    assert(got.exists(r => r._2 == r._3))
  }
}
