package graft

import org.apache.spark.sql.SparkSession

/** Physical-strategy sweep over every registered query — part
  * diagnostic (prints the per-query operator inventory for eyeballing)
  * and part GATE: the two non-broadcast shapes that mean a scale
  * regression anywhere in the suite — CartesianProduct (a single-row
  * frame joined without a broadcast hint degrades to this when the
  * estimator misfires) and SortMergeJoin (every join in the suite is
  * broadcast or bucket-co-located by design) — fail the sweep loudly
  * instead of scrolling past a human.
  *
  *   sbt "Test/runMain graft.PlanSweep [sfDir]"
  */
object PlanSweep {

  /** Plan-IO parity between `spark.sql.constraintPropagation.enabled`
    * on and off, per query: the bench disables the rule as a pure
    * optimizer-LATENCY trade (Bench.scala), on the measured claim that
    * no pinned plan's IO changes — every filter in the suite is
    * explicit, so the inferred extras never reach a scan. This helper
    * LOCKS that claim: for each registered query it captures the
    * executed plan under both settings and compares the IO-shaped
    * operator counts (parquet scans, exchanges, joins). A future query
    * whose plan comes to rely on an inferred predicate (join-key
    * transitivity pruning a scan, an IsNotNull enabling a pushdown)
    * shows up as a count delta here instead of the bench silently
    * measuring a different plan than correctness validates.
    * Returns offenders as (query, metricsOn, metricsOff). */
  def constraintPropParity(spark: SparkSession,
                           sf: String): Seq[(String, String, String)] = {
    def metrics(p: String): String = {
      def n(marker: String) = marker.r.findAllIn(p).size
      s"scans=${n("Scan parquet")} exchanges=${n("Exchange")} " +
        s"bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
        s"topk=${n("TakeOrderedAndProject")}"
    }
    def planWith(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                 enabled: Boolean): String = {
      val key = "spark.sql.constraintPropagation.enabled"
      val prev = spark.conf.get(key)
      spark.conf.set(key, enabled.toString)
      try {
        val df = fn(spark, sf)
        df.collect()
        df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      } finally spark.conf.set(key, prev)
    }
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val on = metrics(planWith(fn, enabled = true))
      val off = metrics(planWith(fn, enabled = false))
      if (on == off) None else Some((name, on, off))
    }
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val marks = Seq("CartesianProduct", "SortMergeJoin",
      "BroadcastNestedLoopJoin", "BroadcastHashJoin", "Exchange",
      "TakeOrderedAndProject")
    val forbidden = Seq("CartesianProduct", "SortMergeJoin")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, sf)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        val found = marks.filter(p.contains)
        println(f"$name%-26s ${found.mkString(", ")}")
        forbidden.filter(p.contains).map(name -> _)
    }
    // constraint-prop parity rides the sweep too (opt-out via
    // GRAFT_SWEEP_CP=off for quick local iterations): the sweep is the
    // tool that runs at arbitrary scale dirs, so the parity claim gets
    // re-checked at every sweep multiple, not just the spec's fixture
    val cpOffenders =
      if (sys.env.getOrElse("GRAFT_SWEEP_CP", "on") == "off") Seq.empty
      else constraintPropParity(spark, sf)
    cpOffenders.foreach { case (q, on, off) =>
      println(s"CP-PARITY $q: on[$on] != off[$off]")
    }
    spark.stop()
    require(offenders.isEmpty,
      "forbidden physical shapes: " + offenders
        .map { case (q, m) => s"$q=$m" }.mkString(", "))
    require(cpOffenders.isEmpty,
      "constraintPropagation on/off changed plan IO: " +
        cpOffenders.map(_._1).mkString(", "))
  }
}
