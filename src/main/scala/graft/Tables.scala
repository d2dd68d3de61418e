package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All tables are plain parquet, one file per table, identical schemas
  * across scale factors. Loading goes through `spark.read.parquet` so
  * Catalyst gets full pushdown (PushedFilters / ReadSchema pruning) —
  * never pre-collect or cache here; each query declares exactly the
  * columns it needs and the scan prunes to them.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Analyzed base DataFrame per (session, path), cached for the life
    * of the JVM: a 100-query suite otherwise re-lists the same ten
    * immutable fixture files AND re-infers their schemas once per
    * query — pure per-query fixed cost. The cached value is the bare
    * `spark.read.parquet` relation; every query still declares its own
    * projection/filters on top, so pushdown and pruning are untouched
    * (the relation is logical — Catalyst re-plans it per query).
    * In-process only — a regenerated fixture is a new JVM — and keyed
    * weakly by the session + exact path, so test sessions and distinct
    * scale factors never alias, a stopped session's entries are never
    * served to a new one, and dead sessions' entries are collectable
    * with their session. */
  private val dfCache = new SessionCache[DataFrame]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    dfCache.get(spark, path)(spark.read.parquet(path))
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` normalization — the fixture has shipped two physical
    * layouts across driver generations, both normalized here to a
    * session-zone TIMESTAMP (all mains pin UTC) so every consumer sees
    * one type:
    *  - TIMESTAMP(NANOS): Spark's reader rejects it outright — read as
    *    raw nanos (legacy conf) and integer-divide to microseconds,
    *    exactly DuckDB's own ns → TIMESTAMP[µs] truncation.
    *  - TIMESTAMP[µs] (current fixtures): read natively (arrives as
    *    NTZ), cast to TIMESTAMP — an identity on the wall-clock value
    *    under the pinned UTC session zone, and the same instants DuckDB
    *    reads from the file.
    *
    * The nanosAsLong conf should be set at session-build time (the
    * Bench/Verify mains and the test harness do); the guarded set here
    * is a convenience fallback for ad-hoc sessions — a no-op when the
    * conf is already correct, so repeated loads never churn session
    * state. */
  def events(s: SparkSession, d: String): DataFrame = {
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    if (s.conf.getOption(k).forall(_ != "true")) s.conf.set(k, "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _: org.apache.spark.sql.types.TimestampType => raw
      case other =>
        // fail loudly: a third physical layout must be normalized HERE,
        // not flow downstream untyped ("every consumer sees one type")
        throw new IllegalStateException(
          s"events.ts arrived as unexpected type $other from $d — " +
            "add a normalization case in Tables.events")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Rebalance a compute-bound narrow stage across all cores. Parquet
    * splits only at row-group boundaries, and the fixture tables are
    * single-row-group files — without this, fused per-row compute
    * (128-perm minhash, simhash votes, regex scoring) runs in ONE task
    * regardless of core count. The round-robin shuffle moves only the
    * projected input columns (sub-MB here), a fraction of the compute
    * it unlocks. At production scale inputs arrive as many files, so
    * the exchange coalesces into ordinary split planning; keeping the
    * explicit rebalance still protects against stragglers from skewed
    * file sizes feeding a CPU-heavy map. */
  def rebalance(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Presentation sort for PROVABLY SMALL results — grouped aggregates
    * over bounded-cardinality keys (event types, languages, brands,
    * nations, months, sources). Such results stay at a few hundred rows
    * at ANY corpus scale, so a distributed range sort — a sampling job
    * plus a range exchange — is pure scheduling overhead on every call;
    * one final task sorts the rows with no extra shuffle and the same
    * total order. Corpus-sized ordered outputs (per-document tables,
    * per-user stats, time series) must keep a full `orderBy` — only
    * bounded-key aggregates may use this. */
  implicit class SmallResult(private val df: DataFrame) {
    def smallOrdered(cols: Column*): DataFrame =
      df.coalesce(1).sortWithinPartitions(cols: _*)
  }
}
