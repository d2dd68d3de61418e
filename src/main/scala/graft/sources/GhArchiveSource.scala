package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** GHArchive as a first-class Spark DataSource V2 (S2 as a SOURCE, not
  * a fetch step): `spark.read.format("gharchive").option("start",
  * "2024-01-15-0").option("end", "2024-01-15-23").load()` yields
  * `(date STRING, hour INT, line STRING)` — one row per raw NDJSON
  * event line, one input partition per archive hour.
  *
  * Why a DSv2 rather than fetch-then-read (`GhFetch` remains for the
  * reference's land-to-disk pipeline): the catalog integration makes
  * hour PRUNING a planner concern — `WHERE hour BETWEEN 9 AND 17` (or
  * a date range) reaches `pushFilters`, and non-matching hours are
  * never planned, never fetched, never gunzipped. At a month of
  * backfill that is the difference between 744 downloads and the 9
  * the query needs. Reading streams straight from the HTTP (or any
  * URL-schemed) endpoint into executors — no driver-side landing dir,
  * and hour files fan out across the cluster instead of serializing
  * through one process.
  *
  * Semantics carried over from the reference
  * (`update-contributor-scores.js:71-96,195-236`): the URL shape
  * `$base/$date-$hour.json.gz` (hour unpadded), gunzip on read, and
  * 404-tolerance — a missing hour is an EMPTY partition with a stderr
  * note, the reference's per-hour log-and-continue (O3). Anything
  * else (corrupt payload, refused connection) still fails the task:
  * only known-absent data is skippable, silent data loss is not.
  *
  * Scale shape: one partition per hour bounds task count by the
  * requested range; each task is a single sequential gunzip scan
  * (exactly what the format affords — .gz is not splittable);
  * projection pushdown drops unreferenced columns at the reader.
  * The planner re-applies every pushed filter (pushFilters returns
  * them as residual), so pruning is a pure optimization, never a
  * correctness dependency.
  */
class GhArchiveSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gharchive"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GhArchiveSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    // properties arrive with the caller's original key case — fold to
    // lower so option("baseUrl", …) and option("baseurl", …) both land
    new GhArchiveTable(properties.asScala.toMap.map {
      case (k, v) => k.toLowerCase -> v })
}

object GhArchiveSource {
  val Schema: StructType = StructType(Seq(
    StructField("date", StringType, nullable = false),
    StructField("hour", IntegerType, nullable = false),
    StructField("line", StringType, nullable = false)))

  /** All (date, hour) pairs from `start` to `end` inclusive, both in
    * the archive's own `yyyy-MM-dd-H` naming. */
  private[graft] def hoursInRange(start: String,
                                    end: String): Seq[(String, Int)] = {
    def parse(s: String): (java.time.LocalDate, Int) = {
      val i = s.lastIndexOf('-')
      require(i > 0, s"expected yyyy-MM-dd-H, got '$s'")
      (java.time.LocalDate.parse(s.substring(0, i)),
        s.substring(i + 1).toInt)
    }
    val (d0, h0) = parse(start)
    val (d1, h1) = parse(end)
    val from = d0.atStartOfDay(java.time.ZoneOffset.UTC).plusHours(h0)
    val to = d1.atStartOfDay(java.time.ZoneOffset.UTC).plusHours(h1)
    Iterator.iterate(from)(_.plusHours(1)).takeWhile(!_.isAfter(to))
      .map(t => (t.toLocalDate.toString, t.getHour)).toSeq
  }

  /** Does (date, hour) satisfy one pushed source filter? Unhandled
    * filter shapes were never accepted by pushFilters, so this covers
    * exactly the accepted set. */
  private[graft] def matches(date: String, hour: Int, f: Filter): Boolean = {
    def cmp(attr: String, v: Any): Option[Int] = attr.toLowerCase match {
      case "date" => Some(date.compareTo(v.toString))
      case "hour" => Some(hour.compare(v.asInstanceOf[Number].intValue()))
      case _ => None
    }
    f match {
      case EqualTo(a, v) => cmp(a, v).forall(_ == 0)
      case GreaterThan(a, v) => cmp(a, v).forall(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v).forall(_ >= 0)
      case LessThan(a, v) => cmp(a, v).forall(_ < 0)
      case LessThanOrEqual(a, v) => cmp(a, v).forall(_ <= 0)
      case In(a, vs) => a.toLowerCase match {
        case "date" => vs.exists(_.toString == date)
        case "hour" => vs.exists(_.asInstanceOf[Number].intValue() == hour)
        case _ => true
      }
      case _ => true
    }
  }

  private[graft] def accepts(f: Filter): Boolean = f match {
    case EqualTo(a, _) => prunable(a)
    case GreaterThan(a, _) => prunable(a)
    case GreaterThanOrEqual(a, _) => prunable(a)
    case LessThan(a, _) => prunable(a)
    case LessThanOrEqual(a, _) => prunable(a)
    case In(a, _) => prunable(a)
    case _ => false
  }

  private def prunable(attr: String): Boolean = {
    val a = attr.toLowerCase; a == "date" || a == "hour"
  }
}

private[sources] class GhArchiveTable(props: Map[String, String])
    extends Table with SupportsRead {
  require(props.contains("start") && props.contains("end"),
    "gharchive source requires start and end options (yyyy-MM-dd-H)")

  override def name(): String =
    s"gharchive(${props("start")}..${props("end")})"
  override def schema(): StructType = GhArchiveSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GhArchiveScanBuilder(
      props.getOrElse("baseurl",
        graft.streaming.GhFetch.DefaultArchiveUrl),
      props("start"), props("end"))
}

private[sources] class GhArchiveScanBuilder(baseUrl: String, start: String,
                                            end: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GhArchiveSource.Schema

  /** Accept the date/hour shapes for PRUNING but return every filter
    * as residual — Spark re-evaluates them, so pruning can only skip
    * work, never change results. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GhArchiveSource.accepts)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] =
      GhArchiveSource.hoursInRange(start, end)
        .filter { case (d, h) =>
          pushed.forall(GhArchiveSource.matches(d, h, _)) }
        .map { case (d, h) =>
          GhHourPartition(baseUrl, d, h): InputPartition }
        .toArray

    override def createReaderFactory(): PartitionReaderFactory =
      new GhHourReaderFactory(required.fieldNames)
  }
}

private[sources] case class GhHourPartition(baseUrl: String, date: String,
                                            hour: Int) extends InputPartition

private[sources] class GhHourReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GhHourPartition]
    new GhHourReader(gp, fields)
  }
}

private[sources] class GhHourReader(p: GhHourPartition,
                                    fields: Array[String])
    extends PartitionReader[InternalRow] {
  private val url = s"${p.baseUrl}/${p.date}-${p.hour}.json.gz"
  private var reader: java.io.BufferedReader = _
  private var line: String = _

  // open lazily-but-now, tolerating ONLY known absence (HTTP 404 /
  // missing file → FileNotFoundException): the reference's per-hour
  // log-and-continue. A corrupt or half-served payload still throws
  // mid-read and fails the task — retriable, never silently empty.
  try {
    val in = new java.net.URI(url).toURL.openStream()
    reader = new java.io.BufferedReader(new java.io.InputStreamReader(
      new java.util.zip.GZIPInputStream(in), "UTF-8"))
  } catch {
    case _: java.io.FileNotFoundException =>
      System.err.println(s"[gharchive] $url absent — empty hour")
      reader = null
  }

  override def next(): Boolean = {
    if (reader == null) return false
    line = reader.readLine()
    line != null
  }

  override def get(): InternalRow = {
    val values: Array[Any] = fields.map {
      case "date" => UTF8String.fromString(p.date)
      case "hour" => p.hour
      case "line" => UTF8String.fromString(line)
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = if (reader != null) reader.close()
}
