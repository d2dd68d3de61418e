package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import graft.operators.DedupOps

/** Pins the round-14 verifyJaccard fix: the melted candidate relation
  * must carry NO static broadcast hint (a pinned hint crossed Spark's
  * 8 GiB broadcast cap at the 125× rung — 10 GiB of candidates — and
  * crashed x02 plus the x17/x57 cluster-artifact builds that embed its
  * chain; dev/sweeps/r14_125x.json). The cheap path is not lost:
  * AQE's dynamic join selection still converts the verify join to a
  * broadcast at fixture scale, which the second test pins by EXECUTING
  * the dataset itself (count() spawns a separate QueryExecution whose
  * plan never finalizes) and then finding a BroadcastHashJoinExec
  * keyed on doc_id — the verify join's key, and the only join in
  * x02's chain — inside the finalized adaptive plan, descending
  * through materialized QueryStageExec boundaries (query stages are
  * leaf nodes, so a plain collect over the root sees none of the
  * executed stages' internals). If either test fails, someone
  * re-pinned the hint (first) or the small-scale verify join degraded
  * to a shuffle join (second).
  */
class AdaptiveVerifyJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf).select($"doc_id", $"text")
  private def x02 = DedupOps.dedupMinhashLshOf(docs)

  /** Collect across the whole finalized plan, including the insides of
    * materialized query stages and reused exchanges (all leaf nodes to
    * a plain collect). */
  private def collectEverywhere[T](p: SparkPlan)(
      pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val nested = p.collect {
      case q: QueryStageExec => collectEverywhere(q.plan)(pf)
      case a: AdaptiveSparkPlanExec => collectEverywhere(a.executedPlan)(pf)
      case r: ReusedExchangeExec => collectEverywhere(r.child)(pf)
    }.flatten
    p.collect(pf) ++ nested
  }

  test("x02's plan carries no static broadcast hint") {
    // x02's analyzed plan is truncated at the shingle-set
    // localCheckpoint's LogicalRDD, so scan BOTH sides of that
    // boundary: the downstream verify chain (where the round-14 hint
    // lived) and the upstream shingle chain.
    val downstream = x02.queryExecution.analyzed.collect {
      case h: ResolvedHint => h
    }
    val upstream =
      DedupOps.shingleSetsOf(docs).queryExecution.analyzed.collect {
        case h: ResolvedHint => h
      }
    assert(downstream.isEmpty && upstream.isEmpty,
      s"static join hints found in x02's plan: ${downstream ++ upstream}")
  }

  test("x56 pins the verify broadcast only under the MEASURED pair cap") {
    // the r15 cheap-path recovery (VERDICT r14 #3): snapshotDedup
    // counts its checkpointed candidate frame and pins broadcast(…)
    // on the melted side only when the actual count sits under
    // spark.graft.verifyBroadcastMaxPairs — bounded by measurement,
    // never by assumption. Under the cap (the fixture) the hint must
    // be present; forcing the cap to 0 must drop it AND leave the
    // results row-identical.
    val q = SparkEntry.queries("x56_snapshot_dedup")
    val pinnedDf = q(spark, sf)
    val pinned = pinnedDf.queryExecution.analyzed.collect {
      case h: ResolvedHint => h
    }
    assert(pinned.nonEmpty,
      "fixture candidates sit under the cap — the verify broadcast " +
        "must be pinned from the measured count")
    spark.conf.set("spark.graft.verifyBroadcastMaxPairs", "0")
    try {
      val adaptiveDf = q(spark, sf)
      val hints = adaptiveDf.queryExecution.analyzed.collect {
        case h: ResolvedHint => h
      }
      assert(hints.isEmpty,
        "over the cap the verify join must stay AQE-adaptive (no hint)")
      assert(pinnedDf.collect().toSeq == adaptiveDf.collect().toSeq,
        "the two verify branches must agree row-for-row")
    } finally spark.conf.unset("spark.graft.verifyBroadcastMaxPairs")
  }

  test("AQE broadcasts the verify join itself at fixture scale") {
    val df = x02
    df.foreach(_ => ()) // execute THIS dataset so ITS adaptive plan finalizes
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val verifyJoins = collectEverywhere(finalPlan) {
      case b: BroadcastHashJoinExec
          if (b.leftKeys ++ b.rightKeys)
            .exists(_.references.exists(_.name == "doc_id")) => b
    }
    assert(verifyJoins.nonEmpty,
      "expected AQE to convert the doc_id-keyed verify join to a " +
        "broadcast hash join at fixture scale; final plan:\n" + finalPlan)
  }
}
