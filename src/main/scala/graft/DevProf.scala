package graft
import org.apache.spark.sql.SparkSession

/** Dev loop, perf flavor: time ONE registered query (warmup at
  * sf0.001, then N reps at the target dir, Bench's noop-sink
  * discipline) and dump its final AQE plan —
  * `sbt "runMain graft.DevProf x22_knn_join /root/testdata/sf0.1 5"`.
  * This is the inner loop for chasing a bench outlier; the full
  * measurement is graft.Bench. */
object DevProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    def run(dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    try run("/root/testdata/sf0.001") catch { case _: Throwable => () }
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      run(sfDir)
      println(f"rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val df = fn(spark, sfDir)
    df.collect()
    println(df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0))
    spark.stop()
  }
}
