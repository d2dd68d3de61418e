package graft

import org.apache.spark.sql.SparkSession

/** Library facade: session-level setup for SQL access.
  *
  * `registerTables` exposes every driver table as a temp view (with the
  * events ns→µs normalization applied), and `GraftExpressions.register`
  * exposes the custom codegen functions — after this, the full surface
  * is reachable from plain `spark.sql`:
  *
  * {{{
  *   Graft.init(spark, "/root/testdata/sf0.01")
  *   spark.sql("SELECT graft_cosine(a.embedding_d, b.embedding_d) ...")
  * }}}
  */
object Graft {

  def registerTables(spark: SparkSession, sfDir: String): Unit =
    Tables.all.foreach { name =>
      val df = if (name == "events") Tables.events(spark, sfDir)
               else Tables.table(spark, sfDir, name)
      df.createOrReplaceTempView(name)
    }

  def init(spark: SparkSession, sfDir: String): Unit = {
    registerTables(spark, sfDir)
    plans.GraftExpressions.register(spark)
  }
}
