package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Incremental refresh of the ensure* artifacts: appending files to a
  * corpus must refresh the overlap artifact by MERGING the previous
  * artifact's mergeable state with the delta files' partial — cost
  * O(delta + state) — while serving results bit-for-bit equal to a
  * one-shot rebuild.
  *
  * The no-full-corpus-scan claim is proven destructively, not by plan
  * inspection: after the base build, the ORIGINAL corpus file is
  * overwritten with garbage bytes of the SAME length and mtime (so the
  * content-key part string — name:len:mtime — still matches the base
  * artifact's recorded listing). A full rebuild would have to read
  * that file and die on corrupt parquet; the incremental refresh
  * passing with correct results is only possible if the old file was
  * never opened. */
class EnsureIncrementalSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)], dir: String): Unit =
    rows.toDF("doc_id", "text", "source")
      .select($"doc_id", $"text", lit("en").as("lang"), $"source",
        length($"text").cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(dir)

  private def moveParts(from: String, into: String, tag: String): Unit = {
    val src = new java.io.File(from)
    src.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex
      .foreach { case (f, i) =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(into, s"append-$tag-$i.parquet")) }
  }

  // shared 3-gram shingles across sources and batches: "alpha beta
  // gamma" lives in b1/d1 (batch 1) and a2/c2 (batch 2), so the merged
  // matrix must count CROSS-BATCH pairs the per-batch partials alone
  // cannot see
  private val batch1 = Seq(
    (1L, "alpha beta gamma delta epsilon zeta", "src-b"),
    (2L, "alpha beta gamma eta theta iota", "src-d"),
    (3L, "kappa lambda mu nu xi omicron", "src-b"),
    (4L, "pi rho sigma tau upsilon phi", "src-d"))
  // delta introduces sources sorting BEFORE and BETWEEN the old ones —
  // the bit-remap of the base mask state must move every old bit
  private val batch2 = Seq(
    (11L, "alpha beta gamma delta chi psi", "src-a"),
    (12L, "kappa lambda mu nu omega alef", "src-c"),
    (13L, "pi rho sigma tau bet gimel", "src-a"),
    (14L, "completely novel text without overlap here", "src-e"))

  private def inlineMatrix(rows: Seq[(Long, String, String)]) =
    DedupOps.overlapMatrixOfDocs(
      rows.toDF("doc_id", "text", "source")
        .select($"doc_id", $"source", $"text"))
      .as[(String, String, Long)].collect().toSeq

  test("append refresh merges state, never re-reads old files, serves ≡ rebuild") {
    val root = java.nio.file.Files.createTempDirectory("graft-inc")
    val d = root.toString
    val idxRoot = java.nio.file.Files
      .createTempDirectory("graft-inc-idx").toString
    val docsDir = s"$d/documents.parquet"
    writeDocs(batch1, docsDir)

    val basePath = DedupOps.ensureOverlapIndex(spark, d, idxRoot)
    val m1 = spark.read.parquet(s"$basePath/matrix")
      .select($"src_a", $"src_b", $"shared")
      .as[(String, String, Long)].collect().toSeq.sorted
    assert(m1 === inlineMatrix(batch1).sorted)
    assert(m1.nonEmpty, "batch 1 must produce cross-source overlap")

    // append the delta files
    val tmp2 = java.nio.file.Files
      .createTempDirectory("graft-inc-b2").toString + "/out"
    writeDocs(batch2, tmp2)
    moveParts(tmp2, docsDir, "b2")

    // garbage the original file, preserving name:len:mtime — any code
    // path that opens it now fails on corrupt parquet
    val orig = new java.io.File(docsDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("append-")).head
    val len = orig.length()
    val mtime = orig.lastModified()
    val garbage = Array.fill[Byte](len.toInt)(0x5A)
    java.nio.file.Files.write(orig.toPath, garbage)
    assert(orig.setLastModified(mtime))
    assert(orig.length() === len)

    val incPath = DedupOps.ensureOverlapIndex(spark, d, idxRoot)
    assert(incPath !== basePath, "appended corpus keys a new artifact")
    val got = spark.read.parquet(s"$incPath/matrix")
      .select($"src_a", $"src_b", $"shared")
      .as[(String, String, Long)].collect().toSeq.sorted
    val want = inlineMatrix(batch1 ++ batch2).sorted
    assert(got === want,
      "merged state must serve bit-for-bit what a one-shot rebuild serves")
    // the cross-batch pair (src-a, src-b) exists ONLY via the merge
    assert(got.exists { case (a, b, _) => a == "src-a" && b == "src-b" })

    // sizes piece merged correctly too (x73's denominators)
    val sizes = spark.read.parquet(s"$incPath/sizes")
      .as[(String, Long)].collect().toMap
    val wantSizes = DedupOps.sourcePairsOf(
        (batch1 ++ batch2).toDF("doc_id", "text", "source")
          .select($"doc_id", $"source", $"text"))
      .distinct().groupBy($"source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(sizes === wantSizes)
  }

  test("LM model append refresh sums counts, never re-reads old files, ≡ rebuild") {
    import graft.operators.TextOps
    val root = java.nio.file.Files.createTempDirectory("graft-inc-lm")
    val d = root.toString
    val idxRoot = java.nio.file.Files
      .createTempDirectory("graft-inc-lm-idx").toString
    val docsDir = s"$d/documents.parquet"
    writeDocs(batch1, docsDir)
    val basePath = TextOps.ensureLmModel(spark, d, idxRoot)

    val tmp2 = java.nio.file.Files
      .createTempDirectory("graft-inc-lm-b2").toString + "/out"
    writeDocs(batch2, tmp2)
    moveParts(tmp2, docsDir, "b2")

    // garbage the original file, preserving name:len:mtime (see above)
    val orig = new java.io.File(docsDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("append-")).head
    val len = orig.length(); val mtime = orig.lastModified()
    java.nio.file.Files.write(orig.toPath, Array.fill[Byte](len.toInt)(0x5A))
    assert(orig.setLastModified(mtime)); assert(orig.length() === len)

    val incPath = TextOps.ensureLmModel(spark, d, idxRoot)
    assert(incPath !== basePath)
    val got = spark.read.parquet(s"$incPath/model")
      .as[(Long, Long, Long)].collect().toSet
    // one-shot rebuild over the SAME logical corpus, from the frames
    val union = (batch1 ++ batch2).toDF("doc_id", "text", "source")
      .select($"doc_id", $"text")
    val want = TextOps.lmModelFromCounts(TextOps.bigramsOfFrame(union)
        .groupBy($"w1", $"w2").agg(count("*").as("c12")))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want,
      "merged counts must train bit-for-bit the one-shot model")
    assert(got.nonEmpty)
  }

  test("cluster labels append refresh: rep contraction ≡ one-shot rebuild") {
    // the hard case: a delta doc can MERGE existing components and can
    // even become the new (min-id) representative of an old cluster
    val dup = "quick brown fox jumps over the lazy dog again today"
    val c1 = Seq(
      (10L, dup, "s"), (11L, dup, "s"),           // old cluster, rep 10
      (12L, "unrelated words one two three four five six", "s"))
    val c2 = Seq(
      (2L, dup, "s"),                              // merges in, new rep 2
      (13L, "another isolated document with nothing shared here", "s"))

    val root = java.nio.file.Files.createTempDirectory("graft-inc-cc")
    val d = root.toString
    val idxRoot = java.nio.file.Files
      .createTempDirectory("graft-inc-cc-idx").toString
    val docsDir = s"$d/documents.parquet"
    writeDocs(c1, docsDir)
    val basePath = DedupOps.ensureClusterIndex(spark, d, idxRoot)
    val baseLabels = spark.read.parquet(s"$basePath/labels")
      .as[(Long, Long)].collect().toMap
    assert(baseLabels(11L) === 10L && baseLabels(10L) === 10L)

    val tmp2 = java.nio.file.Files
      .createTempDirectory("graft-inc-cc-b2").toString + "/out"
    writeDocs(c2, tmp2)
    moveParts(tmp2, docsDir, "b2")

    // garbage the original file, preserving name:len:mtime (see above)
    val orig = new java.io.File(docsDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("append-")).head
    val len = orig.length(); val mtime = orig.lastModified()
    java.nio.file.Files.write(orig.toPath, Array.fill[Byte](len.toInt)(0x5A))
    assert(orig.setLastModified(mtime)); assert(orig.length() === len)

    val incPath = DedupOps.ensureClusterIndex(spark, d, idxRoot)
    assert(incPath !== basePath)
    val got = spark.read.parquet(s"$incPath/labels")
      .as[(Long, Long)].collect().toMap
    val want = DedupOps.dedupClustersOf(
        (c1 ++ c2).toDF("doc_id", "text", "source")
          .select($"doc_id", $"text"))
      .as[(Long, Long)].collect().toMap
    assert(got === want,
      "contracted merge must label bit-for-bit like the one-shot rebuild")
    assert(got(10L) === 2L && got(11L) === 2L && got(2L) === 2L,
      "the delta doc must become the merged cluster's min-id rep")
    assert(got(12L) === 12L && got(13L) === 13L)
  }

  test("an in-place file change disqualifies the append-base") {
    // corpora are immutable by contract (content-keyed paths), so the
    // append-base detection must treat ANY in-place mutation — here a
    // bare mtime touch, the weakest possible change — as "not an
    // append" and fall back to the full rebuild path
    val root = java.nio.file.Files.createTempDirectory("graft-inc2")
    val d = root.toString
    val idxRoot = java.nio.file.Files
      .createTempDirectory("graft-inc2-idx").toString
    val docsDir = s"$d/documents.parquet"
    writeDocs(batch1, docsDir)
    val basePath = DedupOps.ensureOverlapIndex(spark, d, idxRoot)
    assert(new java.io.File(basePath).exists())

    def parts(): Seq[String] = new java.io.File(docsDir).listFiles().toSeq
      .map(f => s"documents.parquet/${f.getName}:${f.length}:${f.lastModified}")
      .sorted
    val safe = d.replaceAll("[^A-Za-z0-9._-]", "_")
    val prefix = s"graft-overlap-index-$safe-v2-"

    // an appended file alone: the base qualifies
    val tmp2 = java.nio.file.Files
      .createTempDirectory("graft-inc2-b2").toString + "/out"
    writeDocs(batch2, tmp2)
    moveParts(tmp2, docsDir, "b2")
    val withAppend = graft.operators.ArtifactBuild.findAppendBase(
      spark, idxRoot, prefix, parts(), "matrix/_SUCCESS")
    // findAppendBase reports the Hadoop URI form ("file:/tmp/...")
    assert(withAppend.map(_._1.stripPrefix("file:")) === Some(basePath))

    // touch an ORIGINAL file's mtime: its part string changes, the
    // base listing is no longer a subset, the base must be rejected
    val orig = new java.io.File(docsDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("append-")).head
    assert(orig.setLastModified(orig.lastModified() + 12345))
    val afterTouch = graft.operators.ArtifactBuild.findAppendBase(
      spark, idxRoot, prefix, parts(), "matrix/_SUCCESS")
    assert(afterTouch === None,
      "a mutated original file must disqualify the append-base")
  }
}
