package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities — the pay-once-shuffle-never-again side of
  * the scale design. Writing a table bucketed (and sorted) by its join
  * key hash-partitions the FILES at write time; every later equi-join
  * or aggregation on that key reads the buckets co-located and skips
  * both the exchange and (with sortBy) the sort. At 100 TB this is the
  * difference between re-shuffling a fact table per query and
  * re-shuffling it once per ingest.
  *
  * The mechanism is Spark's native bucketing (`bucketBy`/`sortBy` +
  * `saveAsTable`); BucketSpec proves the resulting join plan is
  * exchange-free at the physical level. */
object BucketOps {

  /** Materialize `df` as a catalog table bucketed+sorted by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two tables bucketed on the same key with the same
    * bucket count: plans as a sort-merge join with NO exchange on
    * either side (a node-local sort may remain — Spark consumes sortBy
    * metadata only when each bucket is a single file). */
  def bucketedEquiJoin(spark: SparkSession, left: String, right: String,
                       key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
