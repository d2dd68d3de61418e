package graft
import org.apache.spark.sql.SparkSession

/** Dev loop: run ONE registered query by name and print it —
  * `sbt "runMain graft.DevRun x60_mmr_diversity /root/testdata/sf0.01"`.
  * (The full gate is Verify + dev/check.py; this is the per-operator
  * inner loop while building.) */
object DevRun {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args.take(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.show(args.lift(2).map(_.toInt).getOrElse(60), truncate = false)
    df.printSchema()
    spark.stop()
  }
}
