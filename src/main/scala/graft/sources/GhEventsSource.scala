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
  * polls (≤ per_page events each). Across a DRIVER restart an
  * uncommitted poll's rows are gone — the API cannot re-serve the
  * past, the socket-source caveat. Deployments that need replayable
  * raw history keep the reference's land-to-disk shape (`pollEvents` →
  * file drop): the archive of record is files; this source is the
  * low-latency tail. The id-keyed watermark dedup downstream absorbs
  * the overlap between consecutive polls (the reference's ZADD-NX).
  *
  * Options: `apiUrl` (stub-able), `token` (else GITHUB_TOKEN),
  * `maxPolls` — a bounded-run cap; without it every trigger polls
  * again, the reference's endless loop. AvailableNow = ONE poll, then
  * drain. */
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
      props.get("maxpolls").map(_.toLong))
}

private[sources] class GhEventsScanBuilder(apiUrl: String,
                                           token: Option[String],
                                           maxPolls: Option[Long])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GhEventsSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan {
    override def readSchema(): StructType = required
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new GhEventsMicroBatch(apiUrl, token, maxPolls, required.fieldNames)
  }
}

/** Stream offset = number of polls consumed. */
private[sources] case class GhPollOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class GhEventsMicroBatch(apiUrl: String,
                                          token: Option[String],
                                          maxPolls: Option[Long],
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

  private def pollOnce(): Unit = {
    buffer(polls) = graft.streaming.GhFetch.pollLines(apiUrl, token).toArray
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
      // PREVIOUS driver — its rows are unrecoverable (class doc); the
      // batch completes empty with a note rather than failing the
      // restart forever
      val lines = buffer.getOrElse(id, {
        System.err.println(s"[ghevents] poll $id predates this driver — " +
          "rows lost (poll API is not replayable); emitting empty batch")
        Array.empty[String]
      })
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
