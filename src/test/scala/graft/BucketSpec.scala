package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BucketOps

/** Physical proof of the bucketing contract: a join between two tables
  * bucketed on the same key must plan with NO exchange — the shuffle
  * was paid once at write time. (A within-partition Sort may remain:
  * Spark only consumes sortBy metadata when every bucket is a single
  * file, so the exchange elimination is the load-bearing assertion —
  * the exchange is the cluster-wide network cost, the residual sort is
  * node-local.) */
class BucketSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("bucketed equi-join is exchange-free") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars", $"source")
    BucketOps.writeBucketed(docs, "docs_a", "doc_id", 4)
    BucketOps.writeBucketed(docs, "docs_b", "doc_id", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast path: the point is the shuffle-free SMJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketOps.bucketedEquiJoin(spark, "docs_a", "docs_b",
        "doc_id")
      assert(joined.count() === docs.count())
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p.contains("SortMergeJoin"))
      assert(p.contains("Bucketed: true"))
      assert(!p.contains("Exchange"), "bucketed join must not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS docs_a")
      spark.sql("DROP TABLE IF EXISTS docs_b")
    }
  }
}
