package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
import graft.operators.DedupOps

/** Pins the round-14 verifyJaccard fix: the melted candidate relation
  * must carry NO static broadcast hint (a pinned hint crossed Spark's
  * 8 GiB broadcast cap at the 125× rung — 10 GiB of candidates — and
  * crashed x02 plus the x17/x57 cluster-artifact builds that embed its
  * chain; dev/sweeps/r14_125x.json). The cheap path is not lost:
  * AQE's dynamic join selection still converts the verify join to a
  * broadcast at fixture scale, which the second test pins by running
  * the query and finding a broadcast exchange in the final adaptive
  * plan. If either test fails, someone re-pinned the hint (first) or
  * the small-scale plan degraded to a shuffle join (second).
  */
class AdaptiveVerifyJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def x02 = DedupOps.dedupMinhashLshOf(
    Tables.documents(spark, sf).select($"doc_id", $"text"))

  test("x02's plan carries no static broadcast hint") {
    val hints = x02.queryExecution.analyzed.collect {
      case h: ResolvedHint => h
    }
    assert(hints.isEmpty,
      s"static join hints found in x02's analyzed plan: $hints")
  }

  test("AQE still broadcasts the verify join at fixture scale") {
    val df = x02
    assert(df.count() >= 0) // execute so AQE finalizes the plan
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val broadcasts = finalPlan.collect {
      case b: BroadcastExchangeLike => b
    }
    assert(broadcasts.nonEmpty,
      "expected AQE to convert the small-side verify join to a " +
        "broadcast at fixture scale; final plan:\n" + finalPlan)
  }
}
