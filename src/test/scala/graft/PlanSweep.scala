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
    spark.stop()
    require(offenders.isEmpty,
      "forbidden physical shapes: " + offenders
        .map { case (q, m) => s"$q=$m" }.mkString(", "))
  }
}
