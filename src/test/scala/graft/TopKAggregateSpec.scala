package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{GraftExpressions, TopKHeap}

/** The bounded-heap grouped top-K aggregate vs the window-function
  * formulation, plus heap edge cases. */
class TopKAggregateSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("x16 grouped top-K ≡ q12 window row_number result") {
    val viaHeap = SparkEntry.queries("x16_grouped_topk")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val viaWindow = SparkEntry.queries("q12_window_rank")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(viaHeap === viaWindow)
  }

  test("x32 group sample ≡ the window-function formulation") {
    import org.apache.spark.sql.expressions.Window
    val viaHeap = SparkEntry.queries("x32_group_sample")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val rk = conv(substring(md5(concat(lit("smp_"), $"text")), 1, 13), 16, 10)
      .cast("long")
    val viaWindow = Tables.documents(spark, sf)
      .select($"source", $"doc_id", rk.as("rk"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source").orderBy($"rk".desc, $"doc_id")).cast("long"))
      .filter($"rn" <= operators.TextOps.GroupSampleK)
      .select($"source", $"rn", $"doc_id", $"rk")
      .orderBy($"source", $"rn")
      .collect().map(_.toSeq).toSeq
    assert(viaHeap === viaWindow)
    assert(viaHeap.nonEmpty)
  }

  test("heap: groups smaller than k, duplicate scores, tie-break by id") {
    GraftExpressions.register(spark)
    val df = Seq(
      ("g1", 5.0, 1L), ("g1", 5.0, 2L), ("g1", 3.0, 3L),
      ("g2", 1.0, 9L))   // smaller than k
      .toDF("g", "s", "i")
      .groupBy($"g")
      .agg(call_function(GraftExpressions.TopKFn, $"s", $"i", lit(2)).as("top"))
      .select($"g", expr("transform(top, e -> e.id)").as("ids"))
      .as[(String, Seq[Long])].collect().toMap
    assert(df("g1") === Seq(1L, 2L))   // 5.0 ties break by id ASC
    assert(df("g2") === Seq(9L))       // partial group kept as-is
  }

  test("heap offer/merge maintain the exact top-k under ranking") {
    val h1 = new TopKHeap(3)
    Seq((1.0, 10L), (9.0, 1L), (5.0, 5L), (9.0, 2L), (0.5, 99L))
      .foreach { case (s, i) => h1.offer(s, i) }
    val h2 = new TopKHeap(3)
    Seq((7.0, 7L), (9.0, 0L)).foreach { case (s, i) => h2.offer(s, i) }
    h1.mergeFrom(h2)
    // global ranking: (9.0,0),(9.0,1),(9.0,2),(7.0,7),(5.0,5),...
    assert(h1.sortedEntries.toSeq === Seq((9.0, 0L), (9.0, 1L), (9.0, 2L)))
  }
}
