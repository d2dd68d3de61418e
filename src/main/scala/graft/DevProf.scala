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
    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.ui.enabled", "false")
    // Extra session confs for A/B experiments, Bench's hook verbatim
    // (SPARK_GRAFT_CONF="spark.x=1;spark.y=2") — big-rung solo runs
    // need e.g. zstd shuffle compression to fit the sandbox disk.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => builder.config(k.trim, v.trim)
        case _ => // tolerate trailing ';' / empty segments
      }
    })
    val spark = builder.getOrCreate()
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
    val observed = new ObservedMetrics(spark)

    val fn = SparkEntry.queries(name)
    def run(dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    try run("/root/testdata/sf0.001") catch { case _: Throwable => () }
    // phase boundary: the warmup ran the same instrumented query at
    // sf0.001 — barrier-drain and drop its events so the DEVPROF line
    // can only carry target-dir counts (the r16 harvest's fixed sleep
    // could leave a stale warmup-scale value behind a lagging bus)
    observed.drain("devprof_drain_warmup")
    observed.clear()
    graft.operators.CountedHint.verdicts.clear()
    for (i <- 1 to reps) {
      val before = M.snapshot
      val t0 = System.nanoTime()
      run(sfDir)
      val secs = (System.nanoTime() - t0) / 1e9
      // deterministic delta read: the sentinel's SQLExecutionEnd rides
      // the same FIFO queue as the rep's stage-completed events, so
      // its arrival proves the stage metrics are in — no fixed sleep
      observed.drain(s"devprof_drain_rep$i")
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
    val drained = observed.drain("devprof_drain_final")
    val (sm, sd, sw, sr) = M.snapshot
    println(s"""DEVPROF {"q":${Json.str(name)},"dir":${Json.str(sfDir)},""" +
      s""""reps":$reps,"spill_mem":$sm,"spill_disk":$sd,""" +
      s""""shuffle_write":$sw,"shuffle_read":$sr,""" +
      s""""observed":${observed.json},"observed_drained":$drained,""" +
      s""""counted_pins":${graft.operators.CountedHint.verdictsJson}}""")
    spark.stop()
  }
}
