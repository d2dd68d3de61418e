package graft

import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The gharchive DataSource V2 against a file:// fixture tree — same
  * URL shape as the live endpoint, so only the scheme differs. */
class GhArchiveSourceSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def writeHour(dir: Path, date: String, hour: Int,
                        lines: Seq[String]): Unit = {
    val out = new GZIPOutputStream(
      Files.newOutputStream(dir.resolve(s"$date-$hour.json.gz")))
    try out.write(lines.map(_ + "\n").mkString.getBytes("UTF-8"))
    finally out.close()
  }

  private def fixture(): (Path, String) = {
    val dir = Files.createTempDirectory("graft-gharchive")
    writeHour(dir, "2024-01-15", 3,
      Seq("""{"id":"1","type":"PushEvent"}""",
          """{"id":"2","type":"WatchEvent"}"""))
    writeHour(dir, "2024-01-15", 4, Seq("""{"id":"3","type":"ForkEvent"}"""))
    (dir, s"file://$dir")
  }

  private def read(base: String, start: String, end: String) =
    spark.read.format("gharchive")
      .option("baseUrl", base).option("start", start).option("end", end)
      .load()

  test("reads every line of every hour in range with (date, hour) attached") {
    val (_, base) = fixture()
    val got = read(base, "2024-01-15-3", "2024-01-15-4")
      .as[(String, Int, String)].collect().sortBy(_._3)
    assert(got.map(_._2).toSeq === Seq(3, 3, 4))
    assert(got.forall(_._1 == "2024-01-15"))
    assert(got.map(r => r._3.contains("\"id\"")).forall(identity))
    assert(got.length === 3)
  }

  test("missing hour is an empty partition, not a failure (404 tolerance)") {
    val (_, base) = fixture()
    // range stretches over hour 5, which was never written
    val got = read(base, "2024-01-15-3", "2024-01-15-5")
    assert(got.count() === 3)
  }

  test("hour predicate prunes partitions before any fetch") {
    val (dir, base) = fixture()
    // hour 4 becomes a PRESENT but CORRUPT file: any attempt to open
    // it throws. A query filtered to hour 3 must succeed — proof the
    // pushed filter pruned the partition and the reader never touched
    // hour 4 — while the unfiltered scan fails on it.
    Files.write(dir.resolve("2024-01-15-4.json.gz"),
      "not gzip at all".getBytes("UTF-8"))
    val filtered = read(base, "2024-01-15-3", "2024-01-15-4")
      .filter($"hour" === 3)
    assert(filtered.count() === 2)
    val all = read(base, "2024-01-15-3", "2024-01-15-4")
    intercept[org.apache.spark.SparkException] { all.count() }
    // date-range shape prunes too
    val byDate = read(base, "2024-01-14-0", "2024-01-15-4")
      .filter($"date" === "2024-01-15" && $"hour" < 4)
    assert(byDate.count() === 2)
  }

  test("pushed filters stay residual: partition-level pruning never over-keeps rows") {
    val (_, base) = fixture()
    // hour >= 4 prunes hour 3's partition AND Spark re-applies the
    // predicate on rows — counts agree with the fixture content
    assert(read(base, "2024-01-15-3", "2024-01-15-4")
      .filter($"hour" >= 4).count() === 1)
  }

  test("projection pushdown: a line-only read carries no date/hour columns") {
    val (_, base) = fixture()
    val df = read(base, "2024-01-15-3", "2024-01-15-3").select($"line")
    assert(df.schema.fieldNames.toSeq === Seq("line"))
    assert(df.as[String].collect().length === 2)
    // and the physical read schema was pruned, not post-projected
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("line") && !scan.contains("hour"))
  }

  test("feeds the existing ingest cleaning path end-to-end") {
    val (_, base) = fixture()
    // the source's line column is exactly the NDJSON the S3 reader
    // parses: schema-on-read json over the line strings
    val lines = read(base, "2024-01-15-3", "2024-01-15-4").select($"line")
      .as[String]
    val parsed = spark.read.json(lines)
    assert(parsed.select($"id").as[String].collect().sorted.toSeq ===
      Seq("1", "2", "3"))
  }
}
