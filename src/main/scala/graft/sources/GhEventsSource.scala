package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The GitHub public-events API poll (S1) as a DSv2 MICRO-BATCH
  * source — the last piece of the reference's ingest lifecycle
  * (`insert-events.js:8-41`, the setInterval poll loop) as a catalog
  * citizen: `spark.readStream.format("ghevents").load()` yields
  * `(poll_id LONG, line STRING)`, one row per event per poll, one
  * poll per trigger. Downstream is the SAME cleaning contract as the
  * file-drop path (`GhIngest.streamCleanLines` — schema-on-read,
  * quarantine, bot filter, watermark dedup), so the two ingest fronts
  * cannot drift.
  *
  * Offset/replay discipline (the public TextSocket source's pattern —
  * a poll API is not an addressable log, so the DRIVER buffers): each
  * trigger polls once via `GhFetch.pollLines` (same Accept header,
  * per_page, Bearer token as the reference) and buffers the lines
  * keyed by poll id; an UNCOMMITTED batch replayed within the run is
  * served verbatim from the buffer; `commit` releases everything at or
  * below the committed offset, so driver memory holds only in-flight
  * polls (≤ per_page events each).
  *
  * DURABLE LANDING (`archiveDir`): with the option set, every poll is
  * written to `<archiveDir>/poll-NNNNNN.ndjson` (temp + atomic rename)
  * BEFORE it is exposed to an offset — the reference's land-before-
  * Redis discipline (`insert-events.js:41-63`). A driver restart then
  * loses NOTHING: an uncommitted batch's poll replays from the archive
  * (planInputPartitions falls back to the landed file when the poll
  * predates this driver's buffer), and the archive doubles as the
  * file-drop-shaped record of raw history (same NDJSON layout
  * `pollEvents` lands, so the file-drop ingest can consume it).
  * Without `archiveDir` the original TextSocket caveat applies: an
  * uncommitted poll is gone across restart and the batch completes
  * empty with a warning. The id-keyed watermark dedup downstream
  * absorbs the overlap between consecutive polls (the reference's
  * ZADD-NX).
  *
  * Options: `apiUrl` (stub-able), `token` (else GITHUB_TOKEN),
  * `maxPolls` — a bounded-run cap; without it every trigger polls
  * again, the reference's endless loop; `archiveDir` — durable
  * land-before-expose. AvailableNow = ONE poll, then drain. */
class GhEventsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "ghevents"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GhEventsSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GhEventsTable(properties.asScala.toMap.map {
      case (k, v) => k.toLowerCase -> v })
}

object GhEventsSource {
  val Schema: StructType = StructType(Seq(
    StructField("poll_id", LongType, nullable = false),
    StructField("line", StringType, nullable = false)))
}

private[sources] class GhEventsTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"ghevents(${props.getOrElse("apiurl", graft.streaming.GhFetch.DefaultApiUrl)})"
  override def schema(): StructType = GhEventsSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GhEventsScanBuilder(
      props.getOrElse("apiurl", graft.streaming.GhFetch.DefaultApiUrl),
      props.get("token").orElse(sys.env.get("GITHUB_TOKEN")),
      props.get("maxpolls").map(_.toLong),
      props.get("archivedir"))
}

private[sources] class GhEventsScanBuilder(apiUrl: String,
                                           token: Option[String],
                                           maxPolls: Option[Long],
                                           archiveDir: Option[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GhEventsSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan {
    override def readSchema(): StructType = required
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new GhEventsMicroBatch(apiUrl, token, maxPolls, archiveDir,
        required.fieldNames)
  }
}

/** Stream offset = number of polls consumed. */
private[sources] case class GhPollOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class GhEventsMicroBatch(apiUrl: String,
                                          token: Option[String],
                                          maxPolls: Option[Long],
                                          archiveDir: Option[String],
                                          fields: Array[String])
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // poll id → that poll's NDJSON lines; retained until committed so an
  // uncommitted batch replays verbatim within this run
  private val buffer = scala.collection.mutable.Map[Long, Array[String]]()
  private var polls = 0L
  // AvailableNow: "available" for a poll API is ONE more poll — a
  // budget spent lazily in latestOffset (where the checkpointed start
  // offset is known, so a restarted run numbers its poll correctly),
  // after which latestOffset stops advancing and the run drains
  private var pollBudget: Option[Long] = None

  override def initialOffset(): Offset = GhPollOffset(0L)

  private def canPoll: Boolean =
    maxPolls.forall(polls < _) && pollBudget.forall(_ > 0)

  private def hadoopConf =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration

  private def archiveFile(id: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(archiveDir.get, f"poll-$id%06d.ndjson")

  /** Land the poll durably BEFORE it can enter an offset: temp file +
    * atomic rename, the reference's land-before-process discipline. A
    * leftover file for the same id (a crashed driver's poll that never
    * reached an offset) is superseded — the archive always equals what
    * the offsets serve. A landing failure fails the poll, so the
    * offset never advances past data that isn't on disk. */
  private def landPoll(id: Long, lines: Array[String]): Unit =
    archiveDir.foreach { dir =>
      val dest = archiveFile(id)
      val fs = dest.getFileSystem(hadoopConf)
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
      val tmp = new org.apache.hadoop.fs.Path(
        dir, f".poll-$id%06d-${System.nanoTime()}.tmp")
      val out = fs.create(tmp, true)
      try lines.foreach { l =>
        out.write(l.getBytes("UTF-8")); out.write('\n') }
      finally out.close()
      if (fs.exists(dest)) fs.delete(dest, false)
      if (!fs.rename(tmp, dest)) {
        fs.delete(tmp, false)
        throw new java.io.IOException(s"could not land poll $id at $dest")
      }
    }

  private def archivedLines(id: Long): Option[Array[String]] =
    archiveDir.flatMap { dir =>
      val p = archiveFile(id)
      val fs = p.getFileSystem(hadoopConf)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        Some(txt.split("\n").filter(_.nonEmpty))
      }
    }

  private def pollOnce(): Unit = {
    val lines = graft.streaming.GhFetch.pollLines(apiUrl, token).toArray
    landPoll(polls, lines)
    buffer(polls) = lines
    polls += 1
    pollBudget = pollBudget.map(_ - 1)
  }

  override def prepareForTriggerAvailableNow(): Unit =
    pollBudget = Some(1L)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def latestOffset(startOff: Offset, limit: ReadLimit): Offset = {
    // resumed run: continue the checkpointed numbering so a fresh
    // poll's id never collides with a committed batch's
    val from = startOff.asInstanceOf[GhPollOffset].n
    if (from > polls) polls = from
    if (canPoll) pollOnce()
    GhPollOffset(polls)
  }

  override def reportLatestOffset(): Offset = GhPollOffset(polls)

  override def planInputPartitions(startOff: Offset,
                                   endOff: Offset): Array[InputPartition] =
    (startOff.asInstanceOf[GhPollOffset].n until
        endOff.asInstanceOf[GhPollOffset].n).map { id =>
      // a poll missing from the buffer is an uncommitted batch from a
      // PREVIOUS driver: with durable landing it replays from the
      // archive (nothing committed OR landed is ever lost); without
      // an archive its rows are unrecoverable (class doc) and the
      // batch completes empty with a note rather than failing the
      // restart forever
      val lines = buffer.get(id).orElse(archivedLines(id)).getOrElse {
        System.err.println(s"[ghevents] poll $id predates this driver — " +
          "rows lost (no archiveDir; poll API is not replayable); " +
          "emitting empty batch")
        Array.empty[String]
      }
      GhPollPartition(id, lines, fields): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    GhPollReaderFactory

  override def deserializeOffset(json: String): Offset =
    GhPollOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = {
    val n = end.asInstanceOf[GhPollOffset].n
    buffer.keys.filter(_ < n).toSeq.foreach(buffer.remove)
    // a restarted stream resumes beyond this driver's poll counter:
    // fast-forward so new polls get fresh ids
    if (n > polls) polls = n
  }

  override def stop(): Unit = buffer.clear()
}

/** The poll's lines ride INSIDE the partition (≤ per_page events, the
  * reference's page size — bytes, not a data path). */
private[sources] case class GhPollPartition(pollId: Long,
                                            lines: Array[String],
                                            fields: Array[String])
    extends InputPartition

private[sources] object GhPollReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GhPollPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < gp.lines.length }
      override def get(): InternalRow = InternalRow.fromSeq(
        gp.fields.toIndexedSeq.map {
          case "poll_id" => gp.pollId
          case "line" => UTF8String.fromString(gp.lines(i))
        })
      override def close(): Unit = ()
    }
  }
}
