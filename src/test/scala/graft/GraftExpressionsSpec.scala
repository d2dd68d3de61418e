package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CoreQueries
import graft.plans.GraftExpressions

/** Cross-validation of the custom codegen expressions against their
  * interpreted higher-order-function formulations: same math, same
  * accumulation order, bitwise-equal results (NO rounding here). */
class GraftExpressionsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("CosineSimilarity expression ≡ HOF fold, bitwise, on real vectors") {
    GraftExpressions.register(spark)
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val q = emb.filter($"vec_id" === 0).select($"e".as("qe"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        call_function(GraftExpressions.CosineFn, $"e", $"qe").as("expr_sim"),
        CoreQueries.cosineSimHof($"e", $"qe").as("hof_sim"))
    assert(both.filter($"expr_sim" =!= $"hof_sim").count() === 0)
  }

  test("CosineSimilarity works in both codegen and interpreted eval") {
    GraftExpressions.register(spark)
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0)), (Seq(1.0, 0.0), Seq(0.0, 1.0)))
      .toDF("a", "b")
      .select(call_function(GraftExpressions.CosineFn, $"a", $"b").as("s"))
    assert(df.as[Double].collect().toSeq === Seq(1.0, 0.0))
  }

  test("CosineSimilarity is NULL on mismatched dimensions (like the HOF)") {
    GraftExpressions.register(spark)
    val df = Seq((Seq(1.0, 0.0), Seq(1.0)))
      .toDF("a", "b")
      .select(call_function(GraftExpressions.CosineFn, $"a", $"b").as("s"),
              CoreQueries.cosineSimHof($"a", $"b").as("h"))
    val r = df.head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("MinHashSignature matches a reference scala implementation") {
    GraftExpressions.register(spark)
    import graft.plans.MinHashSignature.{coefA, coefB, NumHashes, Prime}
    val hashes = Seq(12L, 987654321L, 42L, 4294967295L)
    val got = Seq(Tuple1(hashes)).toDF("hs")
      .select(call_function(GraftExpressions.MinHashFn, $"hs"))
      .as[Seq[Long]].head()
    val want = (0 until NumHashes).map { j =>
      hashes.map(x => (coefA(j) * x + coefB(j)) % Prime).min
    }
    assert(got === want)
  }

  test("SimHash64 matches a reference scala implementation") {
    GraftExpressions.register(spark)
    val hashes = Seq(0x0f0f0f0f0f0f0f0fL, 0x00ff00ff00ff00ffL, -1L)
    val got = Seq(Tuple1(hashes)).toDF("hs")
      .select(call_function(GraftExpressions.SimHashFn, $"hs"))
      .as[Long].head()
    var want = 0L
    (0 until 64).foreach { j =>
      val votes = hashes.map(x => if (((x >>> j) & 1L) == 1L) 1 else -1).sum
      if (votes > 0) want |= (1L << j)
    }
    assert(got === want)
  }

  test("LongDotProduct: exact integer dot, NULL on length mismatch") {
    GraftExpressions.register(spark)
    val df = Seq((Seq(1000000L, -2000000L), Seq(3L, 4L)),
                 (Seq(1L, 2L), Seq(1L)))
      .toDF("a", "b")
      .select(call_function(GraftExpressions.LongDotFn, $"a", $"b").as("d"))
    val rows = df.collect()
    assert(rows(0).getLong(0) === -5000000L)
    assert(rows(1).isNullAt(0))
  }

  test("LongDotProduct rejects un-quantized (double) input cleanly") {
    GraftExpressions.register(spark)
    val err = intercept[Exception] {
      Tables.embeddings(spark, sf)
        .select(call_function(GraftExpressions.LongDotFn,
          $"embedding".cast("array<double>"),
          $"embedding".cast("array<double>")))
        .collect()
    }
    assert(err.getMessage.contains("array<bigint>"))
  }

  test("HyperplaneSignature rejects un-quantized (double) input cleanly") {
    GraftExpressions.register(spark)
    val err = intercept[Exception] {
      Tables.embeddings(spark, sf)
        .select(call_function(GraftExpressions.HyperplaneFn,
          $"embedding".cast("array<double>")))
        .collect()
    }
    assert(err.getMessage.contains("array<bigint>"))
  }

  test("hyperplane weights are md5-derived, bounded, and dispersive") {
    import graft.plans.HyperplaneSignature.{planes, NumPlanes, Dim}
    assert(planes.length === NumPlanes * Dim)
    assert(planes.forall(w => w >= -500 && w <= 500))
    assert(planes.distinct.length > 100)   // not degenerate
    // spot-check one weight against a from-scratch md5 derivation
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("p_0_0".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    assert(planes(0) === java.lang.Long.parseLong(hex, 16) % 1001L - 500L)
  }

  test("HyperplaneSignature is stable and within plane-count bits") {
    GraftExpressions.register(spark)
    val sigs = Tables.embeddings(spark, sf)
      .select(graft.operators.SimilarityOps.lshSignature(spark,
        $"embedding".cast("array<double>")).as("sig"))
      .as[Long].collect()
    assert(sigs.forall(sg => sg >= 0 &&
      sg < (1L << graft.plans.HyperplaneSignature.NumPlanes)))
    assert(sigs.distinct.length > 1)   // actually disperses
  }
}
