package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: output-row counts for registered queries at a given
  * data dir — the denominator of the sweep protocol's per-unit-OUTPUT
  * cost adjudication (the x02 "15 µs/verified-pair, flat across
  * rungs" standard from dev/sweeps/r14_125x.json: an operator whose
  * output itself grows superlinearly — dup pairs grow ~copies² on the
  * key-shifted sweep corpus BY CONSTRUCTION — is judged on cost per
  * output row, not on wall alone).
  *
  *   sbt "runMain graft.RowCount <sfDir> <query> [query...]"
  */
object RowCount {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
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
    // sweep scripts parse the ROWCOUNT line as JSON — escape the
    // interpolated strings (shared Json helper) so a dir with a
    // quote/backslash stays valid
    try args.drop(1).foreach { n =>
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(
        s"""ROWCOUNT {"q":${Json.str(n)},"dir":${Json.str(dir)},"rows":$c}""")
    } finally spark.stop()
  }
}
