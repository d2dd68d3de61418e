package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.GhFunctions._

/** The reference pipeline re-expressed as Structured Streaming + batch
  * (SURVEY.md §3):
  *
  *  - ingest (`insert-events.js` + `insert-events-into-db.lua`): NDJSON
  *    file-drop → bot filter (F1) → watermark + dropDuplicatesWithinWatermark
  *    (the 300 s dedup-TTL analogue, W3) → append to the bronze events
  *    table partitioned by date/hour.
  *  - backfill (`update-contributor-scores.js`): batch read of hour
  *    files (`.json.gz` decompresses natively) → F2+F3 filters →
  *    1-hour tumbling-window count per login (A1) → idempotent
  *    per-hour-partition overwrite; daily rollup = re-agg from hourly
  *    (A2; recompute-not-merge per SURVEY §7.4.1).
  *
  * Scale stance: the groupBy(window, login) shuffles once on
  * (window, login) with map-side partial aggregation; hour-partitioned
  * output gives partition pruning to every downstream serving query.
  * The micro-batch + watermark + incremental-sink design follows the
  * Structured Streaming model (Armbrust et al., SIGMOD 2018).
  */
object GhIngest {

  /** GitHub event schema (reference `README.md:44-53`). `payload` stays
    * a raw JSON string — it is polymorphic per event type and inferring
    * a union schema explodes (SURVEY §7.4.4); drill in per-query with
    * get_json_object. */
  val ghEventSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("actor", StructType(Seq(
      StructField("id", LongType),
      StructField("login", StringType),
      StructField("display_login", StringType),
      StructField("gravatar_id", StringType),
      StructField("url", StringType),
      StructField("avatar_url", StringType)))),
    StructField("repo", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("url", StringType)))),
    StructField("payload", StringType),
    StructField("public", BooleanType),
    StructField("created_at", TimestampType),
    StructField("org", StructType(Seq(
      StructField("id", LongType),
      StructField("login", StringType)))),
    StructField("_corrupt_record", StringType)))

  /** Batch NDJSON(.gz) read with malformed-line tolerance (S2/S3/O3):
    * PERMISSIVE mode quarantines bad lines into _corrupt_record instead
    * of failing the job — the analogue of the reference's per-line
    * try/catch (`update-contributor-scores.js:147-150`). */
  def readEventsJson(spark: SparkSession, path: String): DataFrame =
    readEventsJson(spark, Seq(path))

  /** Multi-path form — the archive pipeline reads exactly the hour
    * files its fetch walk landed, not whatever else the directory
    * holds. */
  def readEventsJson(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .schema(ghEventSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(paths: _*)

  /** Rows unusable downstream: failed to parse fully (PERMISSIVE mode
    * keeps any prefix fields it managed to read) or missing the event
    * id. The filter deliberately references `id` too — Spark refuses
    * scans whose only referenced column is the internal corrupt-record
    * column, and a bare count() would prune down to it. */
  def corruptRecords(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt_record").isNotNull || col("id").isNull)
      .select(col("id"), col("_corrupt_record"))

  /** Ingest-path cleaning (F1 + drop corrupt + project): the content of
    * the Lua insert script minus storage concerns. Null-login rows are
    * KEPT, matching the reference (`insert-events.js:49` only skips
    * when a login is present AND bot-shaped). One DELIBERATE deviation:
    * rows without an event time are dropped — the reference would
    * insert them, but every consumer here buckets by `created_at`, and
    * a null would land in a __HIVE_DEFAULT_PARTITION__ that poisons
    * partition listings. */
  def cleanEvents(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt_record").isNull)
      .filter(col("id").isNotNull)
      .filter(col("created_at").isNotNull)
      .filter(keepIngest(col("actor.login")))
      .drop("_corrupt_record")

  /** Batch dedup by event id — keep the earliest-created row per id.
    * The remaining columns, packed as ONE struct, are the ORDER-BY
    * tiebreaker (struct ordering is lexicographic over its fields), so
    * the pick is total — deterministic even when two rows share id AND
    * timestamp but differ elsewhere, where plain dropDuplicates or a
    * timestamp-only window would pick arbitrarily. A struct comparison
    * costs field reads only where prefixes tie; rendering every row to
    * JSON for the same totality serialized the whole bronze row per
    * comparison. */
  def dedupEvents(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tiebreak = struct(
      events.columns.filterNot(_ == "created_at").map(col).toIndexedSeq: _*)
    events
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("created_at"), tiebreak)))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** A1/W1 — hourly contributor scores: F2 + F3, then a 1-hour
    * event-time tumbling window count per login. */
  def hourlyScores(events: DataFrame): DataFrame =
    events
      .filter(isScoringType(col("type")))
      .filter(!isBotBatch(col("actor.login")))
      .groupBy(
        window(col("created_at"), "1 hour").getField("start").as("hour"),
        col("actor.login").as("login"))
      .agg(count("*").as("score"))

  /** A2/W2 — daily rollup computed FROM the hourly table (recompute,
    * not in-place merge: idempotent under replay, SURVEY §7.4.1). */
  def dailyRollup(hourly: DataFrame): DataFrame =
    hourly.groupBy(
        date_trunc("day", col("hour")).as("day"),
        col("login"))
      .agg(sum(col("score")).as("score"))

  /** T1/T2 — top-K serving query (plans as TakeOrderedAndProject). */
  def topContributors(scores: DataFrame, k: Int): DataFrame =
    scores.orderBy(col("score").desc, col("login")).limit(k)

  /** T3 — recent events from the bronze table (XREAD analogue). */
  def recentEvents(bronze: DataFrame, k: Int): DataFrame =
    bronze.orderBy(col("created_at").desc, col("id")).limit(k)

  /** T4 — stream metadata (the `XINFO STREAM` analogue): entry count,
    * partition count, and event-time bounds of the bronze table. */
  def streamInfo(spark: SparkSession, bronzeDir: String): DataFrame = {
    val bronze = spark.read.parquet(bronzeDir)
    bronze.agg(
      count("*").as("n_entries"),
      countDistinct(col("event_date"), col("event_hour")).as("n_partitions"),
      min(col("created_at")).as("first_entry"),
      max(col("created_at")).as("last_entry"))
  }

  // ---- streaming --------------------------------------------------------

  /** The reference's dedup-TTL, as event-time streaming state: the 5-min
    * watermark delay plays the role of the `SET ... EX 300` key expiry
    * (W3) — duplicate ids arriving within the horizon are dropped and
    * state is evicted past the watermark, bounding memory exactly like
    * the TTL bounds Redis keys. */
  val DedupWatermark = "5 minutes"

  /** Cleaned, deduped streaming read. `maxFilesPerTrigger` bounds how
    * much input one micro-batch consumes — B2, the analogue of the
    * reference's poll page size (`per_page=100`, `insert-events.js:20`). */
  def streamClean(spark: SparkSession, inputDir: String,
                  maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
      .schema(ghEventSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    cleanEvents(reader.json(inputDir))
      .withWatermark("created_at", DedupWatermark)
      .dropDuplicatesWithinWatermark(Seq("id"))
  }

  /** `streamClean` for a LINE-shaped streaming relation (the
    * `ghevents` DSv2 poll source's `line` column): the SAME
    * schema-on-read (PERMISSIVE quarantine via from_json's corrupt
    * column), bot filter, watermark, and id dedup as the file-drop
    * path — one definition of clean, so the two ingest fronts cannot
    * drift (parity spec-pinned). */
  def streamCleanLines(lines: DataFrame): DataFrame =
    cleanEvents(lines
        .select(from_json(col("line"), ghEventSchema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("e"))
        .select(col("e.*")))
      .withWatermark("created_at", DedupWatermark)
      .dropDuplicatesWithinWatermark(Seq("id"))

  /** Bronze append sink, partitioned by event date+hour — the analogue
    * of the XADD stream + its retention (drop old partitions instead of
    * MAXLEN-trimming rows). `AvailableNow` backfills all pending files
    * then stops, the W5 catch-up semantics. */
  def startIngest(spark: SparkSession, inputDir: String, outDir: String,
                  checkpointDir: String,
                  availableNow: Boolean = true,
                  maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val cleaned = streamClean(spark, inputDir, maxFilesPerTrigger)
      .withColumn("event_date", date_format(col("created_at"), "yyyy-MM-dd"))
      .withColumn("event_hour", hour(col("created_at")))
    val writer = cleaned.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("event_date", "event_hour")
      .outputMode("append")
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Streaming hourly scoring over the bronze table, with INCREMENTAL
    * maintenance of the hourly-scores table — the reference's
    * `ZUNIONSTORE sum + new keys` semantics (A2 incremental,
    * SURVEY §7.4.1) done safely:
    *
    *  - a stateful 1-hour tumbling-window count in UPDATE mode emits,
    *    per micro-batch, the keys whose score changed WITH their full
    *    current value (state carries the running total across batches
    *    and restarts via the checkpoint);
    *  - `foreachBatch` upserts those keys into the partitioned table:
    *    untouched rows of touched partitions are kept via anti-join,
    *    so replays/late increments never double-count (idempotent
    *    upsert, not in-place merge).
    *
    * The watermark bounds state exactly like the reference's key TTLs. */
  def startScoring(spark: SparkSession, bronzeDir: String, hourlyDir: String,
                   checkpointDir: String,
                   watermark: String = "10 minutes"): StreamingQuery = {
    val updates = spark.readStream
      .schema(spark.read.parquet(bronzeDir).schema)
      .parquet(bronzeDir)
      .filter(isScoringType(col("type")))
      .filter(!isBotBatch(col("actor.login")))
      .withWatermark("created_at", watermark)
      .groupBy(
        window(col("created_at"), "1 hour").getField("start").as("hour"),
        col("actor.login").as("login"))
      .agg(count("*").as("score"))
    updates.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        GhBackfill.upsertHourlyScores(batch.sparkSession, batch, hourlyDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
