package graft
import org.apache.spark.sql.SparkSession

/** Dev loop, perf flavor: time ONE registered query (warmup at
  * sf0.001, then N reps at the target dir, Bench's noop-sink
  * discipline) and dump its final AQE plan —
  * `sbt "runMain graft.DevProf x22_knn_join /root/testdata/sf0.1 5"`.
  * This is the inner loop for chasing a bench outlier; the full
  * measurement is graft.Bench.
  *
  * Each rep also prints its STAGE-METRIC deltas (memory/disk spill,
  * shuffle read/write bytes) and the run ends with one DEVPROF JSON
  * line carrying the totals plus any `observe`d work-unit counters
  * (x45 matched pairs, x72 triplets) — the sweep ladder's
  * adjudication protocol wants per-unit cost AND the spill evidence
  * from the SAME solo run. */
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

    // cumulative stage metrics (listener delivery is async; per-rep
    // deltas are read after a bus-drain sleep, totals at the end)
    object M {
      var spillMem = 0L; var spillDisk = 0L
      var shufWrite = 0L; var shufRead = 0L
      def snapshot: (Long, Long, Long, Long) =
        synchronized((spillMem, spillDisk, shufWrite, shufRead))
    }
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) M.synchronized {
            M.spillMem += m.memoryBytesSpilled
            M.spillDisk += m.diskBytesSpilled
            M.shufWrite += m.shuffleWriteMetrics.bytesWritten
            M.shufRead += m.shuffleReadMetrics.totalBytesRead
          }
        }
      })
    val observed =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (n, row) =>
            val fields = row.schema.fieldNames.zipWithIndex.map {
              case (f, i) => s"""\"$f\":${row.get(i)}"""
            }.mkString("{", ",", "}")
            observed.put(n, fields)
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })

    val fn = SparkEntry.queries(name)
    def run(dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    try run("/root/testdata/sf0.001") catch { case _: Throwable => () }
    for (i <- 1 to reps) {
      val before = M.snapshot
      val t0 = System.nanoTime()
      run(sfDir)
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain the listener bus before the delta read
      val after = M.snapshot
      println(f"rep$i $secs%.3f s  " +
        f"spill_mem=${after._1 - before._1}  " +
        f"spill_disk=${after._2 - before._2}  " +
        f"shuffle_write=${after._3 - before._3}  " +
        f"shuffle_read=${after._4 - before._4}")
    }
    val df = fn(spark, sfDir)
    // execute through the frame's OWN QueryExecution so the AQE plan
    // finalizes, but keep rows on the executors — a collect() here
    // pulled the full 125x triplet relation onto the driver
    df.queryExecution.toRdd.foreach(_ => ())
    println(df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0))
    Thread.sleep(1000)
    val (sm, sd, sw, sr) = M.snapshot
    val obsJson = {
      import scala.jdk.CollectionConverters._
      observed.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => s"""\"$k\":$v""" }.mkString("{", ",", "}")
    }
    println(s"""DEVPROF {"q":"$name","dir":"$sfDir","reps":$reps,""" +
      s""""spill_mem":$sm,"spill_disk":$sd,"shuffle_write":$sw,""" +
      s""""shuffle_read":$sr,"observed":$obsJson}""")
    spark.stop()
  }
}
