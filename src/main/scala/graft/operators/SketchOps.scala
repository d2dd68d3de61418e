package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sketch-based aggregates — the approximate path for cardinalities at
  * 100 TB, where exact COUNT(DISTINCT) shuffles every distinct value.
  * `approx_count_distinct` is Spark's HyperLogLog++: mergeable partial
  * sketches, one small state per group, no distinct-value shuffle.
  *
  * No SQL oracle: HLL implementations differ across engines, so the
  * driver records a rows-only check; SketchSpec bounds the estimation
  * error against the exact counts instead. */
object SketchOps {

  def approxDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id", rsd = 0.02).as("approx_users"),
        approx_count_distinct(get_json_object($"props", "$.k"), rsd = 0.02)
          .as("approx_props"),
        count("*").as("n"))
      .orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x13_approx_distinct" -> approxDistinct _,
  )

  val oracleSql: Map[String, String] = Map()
}
