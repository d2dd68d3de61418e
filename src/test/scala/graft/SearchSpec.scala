package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SearchOps

/** BM25 retrieval (x33) against a from-scratch driver-side
  * reimplementation on the fixture: tokenization, tf/df/dl/avgdl, the
  * Okapi formula, the fixed-order rounded sum, and the top-K cut must
  * all agree — and the operator must be deterministic across runs. */
class SearchSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def refBm25(): Seq[(Long, Double, Long)] = {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val n = toks.size.toLong
    val avgdl = toks.values.map(_.size.toLong).sum.toDouble / n
    val tf = toks.map { case (id, ts) =>
      id -> ts.filter(SearchOps.QueryTerms.contains).groupBy(identity)
        .map { case (t, o) => t -> o.size.toLong } }
    val df = SearchOps.QueryTerms
      .map(t => t -> tf.values.count(_.contains(t)).toLong).toMap
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scored = tf.toSeq.filter(_._2.nonEmpty).map { case (id, m) =>
      val dl = toks(id).size.toLong
      // fixed QueryTerms order, contributions rounded to 6 before the sum
      val s = SearchOps.QueryTerms.foldLeft(0.0) { (acc, t) =>
        m.get(t) match {
          case None => acc
          case Some(f) =>
            val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
            acc + r(idf * (f * (SearchOps.K1 + 1.0)) /
              (f + SearchOps.K1 * (1.0 - SearchOps.B +
                SearchOps.B * dl / avgdl)), 6)
        }
      }
      (id, r(s, 4), m.size.toLong)
    }
    scored.sortBy { case (id, s, _) => (-s, id) }.take(SearchOps.TopK)
  }

  test("x33 top-K matches a from-scratch BM25 on the fixture") {
    val got = SearchOps.bm25Search(spark, sf)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got === refBm25())
    assert(got.nonEmpty && got.size <= SearchOps.TopK)
  }

  test("x33 is deterministic across invocations") {
    val a = SearchOps.bm25Search(spark, sf).as[(Long, Double, Long)].collect().toSeq
    val b = SearchOps.bm25Search(spark, sf).as[(Long, Double, Long)].collect().toSeq
    assert(a === b)
  }

  test("x33b: index-served BM25 equals the query-time scan form") {
    // same scoring arithmetic over the same postings — the persisted
    // index must change WHAT IS READ, never the answer
    val served = SearchOps.bm25SearchIndexed(spark, sf)
      .as[(Long, Double, Long)].collect().toSeq
    val scan = SearchOps.bm25Search(spark, sf)
      .as[(Long, Double, Long)].collect().toSeq
    assert(served === scan)
  }

  test("x64: RRF fusion equals a driver recompute from its two legs") {
    // independently rank each leg's own output, fuse with the RRF
    // formula in plain Scala, and demand the operator's exact rows —
    // scores, both rank columns (nulls where a doc is in one leg
    // only), and the (rrf DESC, doc_id) presentation order
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lex = SearchOps.bm25SearchIndexed(spark, sf)
      .as[(Long, Double, Long)].collect()
      .sortBy { case (id, s, _) => (-s, id) }
      .zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
    val vec = operators.SimilarityOps.annLsh(spark, sf)
      .as[(Long, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val expected = (lex.keySet ++ vec.keySet).toSeq.map { id =>
      val c = lex.get(id).map(r => r6(1.0 / (SearchOps.RrfK + r))).getOrElse(0.0) +
        vec.get(id).map(r => r6(1.0 / (SearchOps.RrfK + r))).getOrElse(0.0)
      (id, c, lex.get(id), vec.get(id))
    }.sortBy { case (id, c, _, _) => (-c, id) }
    val got = SearchOps.hybridRrf(spark, sf)
      .as[(Long, Double, Option[Long], Option[Long])].collect().toSeq
    assert(got === expected)
    // both legs genuinely contribute — the fixture must exercise the
    // union of the two candidate sets, not one leg subsuming the other
    assert(expected.exists { case (id, _, l, v) => l.isDefined && v.isEmpty })
    assert(expected.exists { case (id, _, l, v) => l.isEmpty && v.isDefined })
  }

  test("x67: phrase hits replay from a plain-Scala sliding-window scan") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val want = docs.flatMap { case (id, t) =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val ps = toks.sliding(SearchOps.PhraseTerms.size).zipWithIndex
        .collect { case (w, i) if w == SearchOps.PhraseTerms => i + 1L }
        .toSeq
      if (ps.isEmpty) None else Some((id, ps.size.toLong, ps.head))
    }.sortBy { case (id, n, _) => (-n, id) }
      .take(SearchOps.PhraseTopK).toSeq
    val got = SearchOps.phraseSearch(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty, "fixture should contain the test phrase")
    // adjacency is doing the work: every hit doc contains all three
    // words, but docs with the words NON-adjacent must not match
    val bagMatches = docs.count { case (_, t) =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
      SearchOps.PhraseTerms.forall(toks.contains)
    }
    assert(bagMatches > got.size,
      "phrase must be stricter than bag-of-words containment")
  }

  test("x67b: index-served phrase search equals the scan form") {
    val served = SearchOps.phraseSearchIndexed(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val scan = SearchOps.phraseSearch(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(served === scan)
    assert(served.nonEmpty)
  }

  test("term-bucket function agrees between the JVM and Spark forms") {
    // the probe prunes partitions with DRIVER-computed bucket literals
    // against SPARK-computed partition values — any disagreement
    // silently empties a term's postings
    val terms = SearchOps.QueryTerms ++ Seq("", "a", "Ünïcode-테스트", "the")
    val sparkSide = terms.toDF("t")
      .select($"t", SearchOps.termBucketCol($"t").as("b"))
      .as[(String, Int)].collect().toMap
    terms.foreach(t => assert(SearchOps.termBucketJvm(t) === sparkSide(t), t))
  }
}
