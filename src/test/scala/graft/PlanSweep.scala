package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic (not a spec): sweep every registered query's
  * executed plan and report patterns that usually mean a scale
  * regression — CartesianProduct, SortMergeJoin, and exchanges — so a
  * human can eyeball the physical-strategy inventory per query.
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
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val found = marks.filter(p.contains)
      println(f"$name%-26s ${found.mkString(", ")}")
    }
    spark.stop()
  }
}
