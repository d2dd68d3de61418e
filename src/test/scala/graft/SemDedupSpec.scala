package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** x42 SemDeDup: the verdict table must obey the paper's rule exactly —
  * a vector is dropped iff some cluster-mate at cosine ≥ SemTau sits
  * strictly farther from the centroid (or ties with a lower id). The
  * witness set is recomputed here driver-side by brute force over all
  * cluster pairs, independent of the operator's join/when pipeline. */
class SemDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("x42: verdict matches the brute-force witness rule; every cluster keeps its farthest member") {
    val out = SimilarityOps.semDedup(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.size === out.size) // one verdict per vector
    assert(out.exists(!_._4), "fixture should contain semantic dups")

    // exact cosines from the raw vectors, rounded as the operator rounds
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .as[(Long, Array[Double])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    val byCluster = out.groupBy(_._2)
    for ((_, members) <- byCluster) {
      // the cluster's (min cdot, min id) member can never have a witness
      val anchor = members.minBy(m => (m._3, m._1))
      assert(anchor._4, s"cluster anchor ${anchor._1} must be kept")
      for (v <- members) {
        val witness = members.exists(u => u._1 != v._1 &&
          cos(emb(u._1), emb(v._1)) >= SimilarityOps.SemTau &&
          (u._3 < v._3 || (u._3 == v._3 && u._1 < v._1)))
        assert(v._4 === !witness,
          s"vec ${v._1}: kept=${v._4} but witness-exists=$witness")
      }
    }
  }

  test("x63: per-cluster quota ranks by the same centroid dot x42 measures") {
    val got = SimilarityOps.clusterCap(spark, sf)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // independent rank replay from x42's verdict table — same
    // (vec_id, cid, cdot) relation, materialized by a different plan
    val mem = SimilarityOps.semDedup(spark, sf)
      .select($"vec_id", $"cid", $"cdot")
      .as[(Long, Long, Long)].collect().toSeq
    val want = mem.groupBy(_._2).toSeq.flatMap { case (_, ms) =>
      ms.sortBy { case (id, _, d) => (-d, id) }.zipWithIndex.map {
        case ((id, cid, d), i) =>
          (id, cid, d, i + 1L, i + 1L <= SimilarityOps.ClusterCapQ)
      }
    }.sortBy(_._1)
    assert(got === want)
    // the quota binds on the fixture and never over-keeps a cluster
    assert(got.exists(!_._5), "cap should bite")
    got.groupBy(_._2).foreach { case (cid, ms) =>
      assert(ms.count(_._5) ===
        math.min(SimilarityOps.ClusterCapQ, ms.size), s"cluster $cid")
      val keptMin = ms.filter(_._5).map(_._3).min
      val dropMax = ms.filterNot(_._5).map(_._3).maxOption.getOrElse(Long.MinValue)
      assert(keptMin >= dropMax, s"cluster $cid kept a less-central member")
    }
  }
}
