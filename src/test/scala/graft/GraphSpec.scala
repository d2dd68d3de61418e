package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** x66 PageRank vs a from-scratch driver replay: the same edge
  * derivation, the same integer micro-unit arithmetic, the same three
  * unrolled iterations in plain Scala maps — ranks must match exactly,
  * order included. */
class GraphSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("x66 ranks replay from a plain-Scala integer PageRank") {
    val pairs = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct().as[(Long, Long)].collect()
    val edges = pairs ++ pairs.map { case (a, b) => (b, a) }
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var r = deg.keys.map(_ -> GraphOps.PrUnit).toMap
    for (_ <- 1 to GraphOps.PrIters) {
      val mass = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          // floorDiv everywhere: Spark's `div` and DuckDB's `//` both
          // floor, and all quantities here are non-negative anyway
          Math.floorDiv(r(src), deg(src)) }.sum }
      r = mass.map { case (n, m) =>
        n -> (150000L + Math.floorDiv(85L * m, 100L)) }
    }
    val want = r.toSeq
      .sortBy { case (n, rk) => (-rk, n) }.take(GraphOps.PrTopK)
      .map { case (n, rk) =>
        (n, rk, if (n % 2 == 0) "customer" else "supplier", n / 2) }
    val got = GraphOps.pageRank(spark, sf)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got === want)
    // the structure is doing the work: the head of the ranking is the
    // high-degree side of the bipartite graph, not an id artifact
    // (the fixture has far fewer suppliers than customers, so mass
    // concentrates on them; the tail may include customers)
    assert(got.head._3 === "supplier")
    assert(got.takeWhile(_._3 == "supplier").size >= 3)
    // total mass stays near N·unit (the damped walk conserves it up to
    // integer floors) — a wrong deg/div would blow this up or zero it
    val n = r.size.toLong
    assert(r.values.sum > n * 900000L && r.values.sum < n * 1100000L)
  }

  test("x66 served from the artifact ≡ the one-plan inline form") {
    // training math is exact integer arithmetic, so the materialized
    // ranks must replay the in-plan convergence bit for bit
    val served = GraphOps.pageRank(spark, sf)
      .as[(Long, Long, String, Long)].collect().toSeq
    val inline = GraphOps.pageRankInline(spark, sf)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(served === inline)
  }
}
