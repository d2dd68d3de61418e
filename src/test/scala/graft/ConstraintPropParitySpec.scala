package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench runs with `spark.sql.constraintPropagation.enabled=false`
  * (a measured 9%-of-suite optimizer-latency win, Bench.scala) while
  * correctness validates under Spark defaults — sound ONLY while the
  * rule never changes any query's plan IO. This spec pins that
  * invariant in `sbt test`, so the bench config can never silently
  * diverge from the validated plans: every registered query's executed
  * plan must have identical scan/exchange/join/top-K operator counts
  * with the rule on and off. (PlanSweep re-runs the same parity check
  * at arbitrary scale dirs; this is the per-round gate.) */
class ConstraintPropParitySpec extends AnyFunSuite with SparkTestSession {

  test("constraintPropagation on/off: identical plan IO for every query") {
    val offenders = PlanSweep.constraintPropParity(spark, sf)
    assert(offenders.isEmpty,
      "plan IO changed with constraintPropagation:\n" + offenders
        .map { case (q, on, off) => s"  $q: on[$on] != off[$off]" }
        .mkString("\n"))
  }
}
