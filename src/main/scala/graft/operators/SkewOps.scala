package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join split handles sort-merge
  * join skew at runtime; these cover the cases it does not reach —
  * aggregation skew (one hot grouping key saturating a single reducer)
  * and broadcast-infeasible joins against a skewed key — with the
  * classic salting pattern:
  *
  *  phase 1: group/join on (key, salt) so a hot key spreads over
  *           `salts` reducers;
  *  phase 2: merge the partials per key (counts/sums re-aggregate
  *           losslessly; the salt never reaches the result).
  *
  * Salts are derived from a hash of the FULL row content — NOT from
  * monotonically_increasing_id or rand, whose values depend on the task
  * attempt that computes them: under speculative execution or a fetch-
  * failure recompute, an attempt-dependent salt can re-bucket rows
  * between the attempt a reducer already fetched and the recomputed
  * one, double- or under-counting. A content hash is stable across
  * retries; identical rows sharing a salt merely skews the spread a
  * little, never the result.
  */
object SkewOps {

  private def saltCol(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)),
      lit(salts.toLong))

  /** COUNT per key, hot keys spread across `salts` partial groups. */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame =
    df.groupBy(key.as("key"), saltCol(df, salts).as("_salt"))
      .agg(count("*").as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("count"))

  /** SUM of `value` per key, salted two-phase. */
  def saltedSum(df: DataFrame, key: Column, value: Column,
                salts: Int): DataFrame =
    df.groupBy(key.as("key"), saltCol(df, salts).as("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("sum"))

  /** Inner join of a skewed `big` side against a non-broadcastable
    * `small` side on `keyName`: big rows get a content-derived salt,
    * small rows are replicated once per salt value, and the join key
    * becomes (key, salt) — no single reducer owns a hot key. */
  def saltedJoin(big: DataFrame, small: DataFrame, keyName: String,
                 salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", saltCol(big, salts))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(keyName, "_salt")).drop("_salt")
  }

  /** Salt fan-out for the registered x47 entry. */
  val X47Salts = 16

  /** x47 — the salted two-phase aggregation as an ORACLE-CHECKED
    * query: per-user event counts computed through the (key, salt)
    * spread + re-merge, hash-compared against the oracle's plain
    * GROUP BY. The salt must never reach the result — this entry makes
    * that algebra part of the correctness gate rather than a
    * spec-only claim, on the operator a pipeline reaches for when one
    * hot key (the boilerplate fingerprint, the empty-string bucket)
    * saturates a reducer that AQE's join-side splitting can't help. */
  def saltedAgg(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
    saltedCount(ev, col("user_id"), X47Salts)
      .select(col("key").as("user_id"), col("count").as("n_events"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("x47_salted_agg" -> saltedAgg _)

  val oracleSql: Map[String, String] = Map(
    "x47_salted_agg" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
