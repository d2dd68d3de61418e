package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end demo of the full reference lifecycle
  * (SURVEY.md §3) against the GitHub-shaped NDJSON fixture:
  *
  *   ingest stream (F1 + watermark dedup) → bronze table
  *   → scoring stream (F2/F3 + update-mode window agg) → hourly table
  *   → daily rollup → top-K serving + stream info
  *
  * {{{
  *   sbt "runMain graft.streaming.PipelineDemo [inputDir] [workDir]"
  * }}}
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-pipeline").toString
    val input = if (args.nonEmpty) args(0)
      else {
        val in = java.nio.file.Paths.get(work, "in")
        java.nio.file.Files.createDirectories(in)
        // the fixture is a test resource; for the bare demo read it
        // from the repo tree (classpath first, file fallback)
        val src = Option(getClass.getResourceAsStream("/gh_events.ndjson"))
          .getOrElse(new java.io.FileInputStream(
            "src/test/resources/gh_events.ndjson"))
        java.nio.file.Files.copy(src, in.resolve("gh_events.ndjson"))
        in.toString
      }

    println(s"[pipeline] input=$input work=$work")
    def await(q: org.apache.spark.sql.streaming.StreamingQuery,
              what: String): Unit =
      if (!q.awaitTermination(120000)) {
        q.stop()
        sys.error(s"$what did not finish within 120s — results would be " +
          "incomplete; aborting instead of printing truncated numbers")
      }
    await(GhIngest.startIngest(spark, input, s"$work/bronze",
      s"$work/ckpt-ingest"), "ingest stream")
    await(GhIngest.startScoring(spark, s"$work/bronze", s"$work/hourly",
      s"$work/ckpt-score"), "scoring stream")

    println("[pipeline] stream info (XINFO analogue):")
    GhIngest.streamInfo(spark, s"$work/bronze").show(false)

    println("[pipeline] hourly contributor scores:")
    spark.read.parquet(s"$work/hourly")
      .orderBy(col("score_date"), col("score_hour"), col("login"))
      .show(50, truncate = false)

    println("[pipeline] daily rollup + top-3 per day:")
    val daily = GhBackfill.dailySummary(spark, s"$work/hourly")
    daily.orderBy(col("day"), col("score").desc, col("login")).show(false)
    GhIngest.topContributors(daily, 3).show(false)

    println("[pipeline] recent events (XREAD analogue):")
    GhIngest.recentEvents(spark.read.parquet(s"$work/bronze"), 5)
      .select(col("id"), col("type"), col("actor.login"), col("created_at"))
      .show(false)

    spark.stop()
  }
}
