package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Twin-agreement + pass-shape contract for x61b, the scale-safe
  * k-center production twin (VERDICT r14 #2): exact Gonzalez (x61) is
  * K−1 sequential corpus passes; x61b is 2 passes (A-Res pool draw +
  * coverage certificate) with the exact farthest-first confined to the
  * bounded pool. The twin is useful iff its certificate is close to
  * the exact slate's — pinned here at ≤ 2× on the fixture — and iff
  * the pass shape actually is bounded: pool plan = one scan feeding a
  * bounded top-M (TakeOrderedAndProject, never a global Sort), served
  * plan = exactly one embeddings scan (the coverage pass) and zero
  * vector-relation joins.
  */
class KCenterTwinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding".cast("array<double>").as("e"))

  test("x61b emits a full slate: K ranked distinct centers, seed first") {
    val rows = SparkEntry.queries("x61b_kcenter_sampled")(spark, sf).collect()
    assert(rows.length == SimilarityOps.KCenterK)
    assert(rows.map(_.getLong(0)).toSeq == (1L to SimilarityOps.KCenterK))
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    assert(rows.head.getLong(1) == 0L && rows.head.isNullAt(2))
    // selection-time distances are the non-increasing Gonzalez
    // certificate on the pool
    val dists = rows.tail.map(_.getDouble(2)).toSeq
    assert(dists == dists.sorted.reverse,
      s"pool selection distances must be non-increasing: $dists")
  }

  test("x61b coverage radius is within 2x of the exact x61 slate's") {
    val sampled = SparkEntry.queries("x61b_kcenter_sampled")(spark, sf)
      .select($"coverage").head().getDouble(0)
    // score the EXACT slate with the identical certificate arithmetic
    val exactIds = SparkEntry.queries("x61_kcenter_coreset")(spark, sf)
      .select($"vec_id").collect().map(_.getLong(0))
    val vecs = emb.filter($"vec_id".isin(exactIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val exact = SimilarityOps.kcenterCoverage(spark, emb,
      exactIds.toSeq.map(vecs)).head().getDouble(0)
    assert(exact > 0.0, "degenerate fixture: exact slate covers at radius 0")
    assert(sampled <= 2.0 * exact,
      f"sampled coverage $sampled%.4f vs exact $exact%.4f — twin lost " +
        "the 2x certificate bound")
  }

  test("x61b pass shape: bounded top-M pool, one-scan join-free serve") {
    val seedVec = emb.filter($"vec_id" === 0L)
      .select($"e").head().getSeq[Double](0).toArray
    val poolPlan = SimilarityOps.kcenterPool(spark, emb, 0L, seedVec)
      .queryExecution.executedPlan.toString
    assert(poolPlan.contains("TakeOrderedAndProject"),
      "pool draw must be a bounded top-M, not a global sort:\n" + poolPlan)
    assert(!poolPlan.contains("\n+- Sort") && !poolPlan.contains(": Sort"),
      "no full Sort belongs in the pool draw:\n" + poolPlan)

    val served = SparkEntry.queries("x61b_kcenter_sampled")(spark, sf)
    val p = served.queryExecution.executedPlan.toString
    val scans = "embeddings\\.parquet".r.findAllIn(p).length
    assert(scans == 1,
      s"served plan must hold exactly ONE embeddings scan (the coverage " +
        s"certificate), found $scans:\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "no vector-relation join belongs in the served plan:\n" + p)
  }
}
