package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling main for perf iteration (not part of the
  * contract; deleted before commit). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.Tables.SmallResult
    import graft.operators.TextOps

    def time(name: String)(f: => DataFrame): Unit = {
      (1 to 2).foreach(_ => f.write.format("noop").mode("overwrite").save())
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $name%-28s min=${ts.min}%.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    time("x14_current") { TextOps.curationPipeline(spark, d) }
    time("x14_barrier") {
      val t = $"text"
      Tables.rebalance(Tables.documents(spark, d))
        .select($"doc_id", $"source", TextOps.fingerprintCol(t).as("fp"),
          TextOps.langIdCol(t).as("pred_lang"),
          round(TextOps.qualityCol(t), 4).as("q"))
        .repartition(32)
        .filter($"pred_lang" === "en" && $"q" >= 0.4)
        .groupBy($"source")
        .agg(count("*").as("n_kept"), countDistinct($"fp").as("n_unique"),
          round(sum($"q") * 10000).cast("long").as("q_sum_e4"))
        .smallOrdered($"source")
    }
    time("x02_with_ckpt") { graft.operators.DedupOps.dedupMinhashLsh(spark, d) }
    time("x12_current") { graft.operators.SimilarityOps.annIvf(spark, d) }
    time("q22_current") { graft.operators.CoreQueries.sessionization(spark, d) }
    time("q22_preshuffle") {
      val ev = Tables.events(spark, d).repartition($"user_id")
      val sessions = ev
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count("*").as("n"))
      sessions.groupBy($"user_id")
        .agg(count("*").as("n_sessions"), sum($"n").as("n_events"),
          max($"n").as("max_session_events"))
        .orderBy($"user_id")
    }
    spark.stop()
  }
}
