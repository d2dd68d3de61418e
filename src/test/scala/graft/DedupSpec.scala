package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Non-oracled dedup operators verified against Spark-computed exact
  * baselines (brute force over all pairs — fine at sf0.001 scale). */
class DedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("MinHash-LSH output equals exact all-pairs Jaccard at threshold") {
    val lsh = DedupOps.dedupMinhashLsh(spark, sf)
      .select($"da", $"db", $"jaccard").as[(Long, Long, Double)]
      .collect().toSet

    // brute force: exact jaccard over ALL pairs (no LSH candidate step)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", split(lower($"text"), "\\s+").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id", expr(
        "array_distinct(transform(sequence(0, size(w)-3), i -> concat_ws(' ', slice(w, i+1, 3))))"
      ).as("s"))
    val a = docs.select($"doc_id".as("da"), $"s".as("sa"))
    val b = docs.select($"doc_id".as("db"), $"s".as("sb"))
    val inter = size(array_intersect($"sa", $"sb")).cast("long")
    val exact = a.crossJoin(b).filter($"da" < $"db")
      .select($"da", $"db",
        round(inter / (size($"sa") + size($"sb") - inter), 4).as("j"))
      .filter($"j" >= DedupOps.JaccardThreshold)
      .as[(Long, Long, Double)].collect().toSet

    assert(lsh === exact)
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
  }

  test("SimHash banded pairs equal brute-force hamming scan") {
    val banded = DedupOps.dedupSimhash(spark, sf)
      .select($"da", $"db", $"hamming").as[(Long, Long, Long)]
      .collect().toSet

    val docWords = Tables.documents(spark, sf)
      .select($"doc_id", split(lower($"text"), "\\s+").as("w"))
    val sigs = DedupOps.simhashSig(docWords)
    val a = sigs.select($"doc_id".as("da"), $"sig".as("siga"))
    val b = sigs.select($"doc_id".as("db"), $"sig".as("sigb"))
    val exact = a.crossJoin(b).filter($"da" < $"db")
      .select($"da", $"db",
        bit_count($"siga".bitwiseXOR($"sigb")).cast("long").as("h"))
      .filter($"h" <= DedupOps.SimhashMaxHamming)
      .as[(Long, Long, Long)].collect().toSet

    assert(banded === exact)
    assert(exact.nonEmpty)
  }

  test("fingerprint is word-order invariant, content sensitive") {
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "fox brown quick the"),     // same multiset
      (3L, "the quick brown wolf"))
      .toDF("doc_id", "text")
      .select($"doc_id", graft.operators.TextOps.fingerprintCol($"text").as("fp"))
      .as[(Long, String)].collect().toMap
    assert(df(1L) === df(2L))
    assert(df(1L) !== df(3L))
  }

  test("near-dup clusters equal union-find over the exact pair graph") {
    val got = DedupOps.dedupClusters(spark, sf)
      .as[(Long, Long)].collect().toMap
    // driver-side union-find over the same exact pairs
    val pairs = DedupOps.dedupMinhashLsh(spark, sf)
      .select($"da", $"db").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = got.keys.map(d => d -> find(d)).toMap
    assert(got === want)
    // the planted chains collapse transitively (multi-edge components)
    val sizes = got.groupBy(_._2).view.mapValues(_.size)
    assert(pairs.nonEmpty && sizes.values.max >= 3,
      "fixture should contain a component larger than one pair")
  }

  test("contaminationFrames on distinct frames finds planted leaks only") {
    val w = (1 to 60).map(i => s"w$i")
    val train = Seq(
      (1L, w.mkString(" ")),                          // leak source
      (2L, w.map(_ + "x").mkString(" ")),             // disjoint vocab
      (3L, (1 to 60).map(i => s"z$i").mkString(" "))) // disjoint vocab
      .toDF("doc_id", "text")
    // the eval "benchmark" holds a 40-word prefix of doc 1
    val eval = Seq((100L, w.take(40).mkString(" ")))
      .toDF("doc_id", "text")
    val got = DedupOps.contaminationFrames(train, eval)
      .as[(Long, Long, Long)].collect().toSeq
    // 40-word prefix → 38 shingles, every one shared with (only) doc 1
    assert(got === Seq((1L, 100L, 38L)))
  }

  test("block dedup counts match a driver-side sliding-window recompute") {
    val got = DedupOps.dedupBlocks(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    val wins = Tables.documents(spark, sf)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
      .flatMap { case (id, t) =>
        val w = t.split("\\s+")
        (0 to w.length - DedupOps.BlockWords)
          .map(i => (id, w.slice(i, i + DedupOps.BlockWords).mkString(" ")))
      }
    val dup = wins.groupBy(_._2).filter(_._2.map(_._1).distinct.length >= 2).keySet
    val ref = wins.groupBy(_._1).map { case (id, ws) =>
      id -> ((ws.length.toLong, ws.count(x => dup(x._2)).toLong))
    }
    assert(got.length === ref.size)
    got.foreach { case (id, n, nd, f) =>
      assert((n, nd) === ref(id), s"window counts for doc $id")
      assert(f === (nd > 0))
    }
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    assert(got.exists(_._4), "fixture plants cross-doc duplicated blocks")
    assert(got.exists(!_._4))
  }

  test("exact dedup is idempotent: dedup(xs ++ xs) has one row per text") {
    val out = DedupOps.dedupExact(spark, sf)
    assert(out.count() ===
      Tables.documents(spark, sf).select($"text").distinct().count())
    assert(out.filter($"n_copies" =!= 2).count() === 0)
  }
}
