package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.SmallResult

/** Sketch-based aggregates — the approximate path for cardinalities at
  * 100 TB, where exact COUNT(DISTINCT) shuffles every distinct value.
  * `approx_count_distinct` is Spark's HyperLogLog++: mergeable partial
  * sketches, one small state per group, no distinct-value shuffle.
  *
  * The raw HLL estimates are engine-specific, so they cannot be
  * hash-compared directly; instead the query emits the EXACT distinct
  * counts plus booleans asserting the sketch landed within tolerance.
  * DuckDB reproduces the exact counts and expects the booleans TRUE —
  * a full hash-match oracle that genuinely validates the sketch
  * (SketchSpec additionally bounds the raw estimates). */
object SketchOps {

  /** 10× the configured rsd: HLL++ at rsd=0.02 is (empirically and per
    * Heule et al., EDBT 2013) well inside ±5σ; 20% leaves no realistic
    * flake while still catching a broken sketch outright. */
  val Tolerance = 0.2

  def approxDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // exact == 0 (e.g. a group where every value is null) would make
    // the ratio NaN and report a perfectly-correct sketch as not-ok —
    // an all-null group is "within tolerance" iff the sketch also says 0
    val within = (approx: Column, exact: Column) =>
      when(exact === 0L, approx === 0L)
        .otherwise(abs(approx.cast("double") / exact - 1.0) <= Tolerance)
    // Sketches and exact counts run as SEPARATE aggregations joined on
    // the 5-row group key. Mixing them in one agg plans the
    // distinct-rewrite Expand with the HLL++ partial state (2 × ~3 KB
    // sketches) allocated per FIRST-STAGE group — i.e. one sketch
    // buffer per distinct (event_type, user_id) pair, gigabytes of
    // buffer churn for kilobytes of answer (measured: +0.7 s at sf0.1).
    // Split, the sketch pass has 5 groups (the true production query,
    // one narrow scan, no distinct-value shuffle) and the exact pass
    // carries only count buffers through its Expand. The branches scan
    // independently — measured faster than sharing one repartition
    // exchange, whose shuffle costs more than the second columnar scan.
    val ev = Tables.events(s, d)
      .select($"event_type", $"user_id",
        get_json_object($"props", "$.k").as("pk"))
    val sketch = ev.groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", rsd = 0.02).as("approx_users"),
           approx_count_distinct($"pk", rsd = 0.02).as("approx_props"),
           count("*").as("n"))
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"),
           countDistinct($"pk").as("exact_props"))
    sketch.join(broadcast(exact), "event_type")
      .select($"event_type", $"exact_users", $"exact_props", $"n",
        within($"approx_users", $"exact_users").as("users_ok"),
        within($"approx_props", $"exact_props").as("props_ok"))
      .smallOrdered($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x13_approx_distinct" -> approxDistinct _,
  )

  val oracleSql: Map[String, String] = Map(
    "x13_approx_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(count(DISTINCT json_extract_string(props, '$.k')) AS BIGINT)
        |    AS exact_props,
        |  CAST(count(*) AS BIGINT) AS n,
        |  TRUE AS users_ok, TRUE AS props_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
