package graft

import org.scalatest.funsuite.AnyFunSuite

/** The plain-SQL surface: every table reachable from spark.sql after
  * Graft.init, custom functions callable from SQL, results identical to
  * the DataFrame formulations. */
class SqlSurfaceSpec extends AnyFunSuite with SparkTestSession {

  test("all tables are queryable via spark.sql after init") {
    Graft.init(spark, sf)
    Tables.all.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() === 1, t)
    }
  }

  test("SQL aggregation matches the DataFrame query (Q9 shape)") {
    Graft.init(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      .collect().map(_.toSeq).toSeq
    val viaDf = operators.CoreQueries.pricingSummary(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "n")
      .collect().map(_.toSeq).toSeq
    assert(viaSql === viaDf)
  }

  test("custom codegen functions are callable from SQL") {
    Graft.init(spark, sf)
    val top = spark.sql(
      """SELECT e.vec_id,
        |       ROUND(graft_cosine(CAST(e.embedding AS ARRAY<DOUBLE>),
        |                          CAST(q.embedding AS ARRAY<DOUBLE>)), 4) AS sim
        |FROM embeddings e
        |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaDf = operators.CoreQueries.knnCosine(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.toSeq === viaDf.toSeq)
  }
}
