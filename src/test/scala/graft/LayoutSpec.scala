package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

/** Z-order layout: curve-key math against a driver-side reference,
  * the locality guarantee the audit query reports, and the pruning
  * property of the range-partitioned writer. */
class LayoutSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def zRef(x: Long, y: Long): Long = {
    var z = 0L
    (0 until graft.plans.ZOrderKey.Bits).foreach { i =>
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("ZOrderKey matches a driver-side interleave on real keys") {
    val got = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_suppkey",
        LayoutOps.zOrderKey(spark, $"l_partkey", $"l_suppkey").as("z"))
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (p, s, z) => assert(z === zRef(p, s), s"z($p, $s)") }
  }

  test("z-curve locality: a bucket bounds BOTH dimension spans") {
    // fixing the top 2k curve bits fixes the top k bits of each
    // NORMALIZED dimension, so a bucket's raw span is ≤ domain/2^k + 1
    val k = LayoutOps.BucketBits / 2
    val (mnp, mxp, mns, mxs) = Tables.lineitem(spark, sf)
      .agg(min($"l_partkey"), max($"l_partkey"),
           min($"l_suppkey"), max($"l_suppkey"))
      .as[(Long, Long, Long, Long)].head()
    val pBound = (mxp - mnp + 1) / (1L << k) + 1
    val sBound = (mxs - mns + 1) / (1L << k) + 1
    val rows = LayoutOps.zorderLayout(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length > 1, "normalization should spread buckets")
    rows.foreach { case (b, n, minP, maxP, minS, maxS) =>
      assert(n > 0)
      assert(maxP - minP <= pBound, s"part span in bucket $b")
      assert(maxS - minS <= sBound, s"supp span in bucket $b")
    }
    assert(rows.map(_._1).toSeq === rows.map(_._1).toSeq.sorted)
  }

  test("writeZOrdered: files own non-overlapping z-ranges (pruning works)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    LayoutOps.writeZOrdered(spark, Tables.lineitem(spark, sf)
        .select($"l_partkey", $"l_suppkey"),
      $"l_partkey", $"l_suppkey", dir, files = 4)
    // recompute the key on read and check per-FILE ranges are disjoint:
    // that is exactly the property min/max pruning needs
    val ranges = spark.read.parquet(dir)
      .select(LayoutOps.zOrderKey(spark, $"l_partkey", $"l_suppkey").as("z"),
        input_file_name().as("f"))
      .groupBy($"f").agg(min($"z").as("lo"), max($"z").as("hi"))
      .as[(String, Long, Long)].collect()
      .map { case (_, lo, hi) => (lo, hi) }.sortBy(_._1)
    assert(ranges.length > 1, "writer should emit multiple files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "overlapping files")
      case _ =>
    }
    // and the data round-trips completely
    assert(spark.read.parquet(dir).count() ===
      Tables.lineitem(spark, sf).count())
  }

  test("x29 heavy hitters: CMS never underestimates; estimates are mins") {
    val rows = operators.SketchOps.heavyHitters(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= operators.SketchOps.CmsTopK)
    rows.foreach { case (u, trueN, est, over) =>
      assert(est >= trueN, s"CMS underestimated user $u")
      assert(over === est - trueN)
    }
    // ordered by true count desc
    assert(rows.map(-_._2).toSeq === rows.map(-_._2).toSeq.sorted)
  }

  test("streaming CMS: merged micro-batch partials equal the batch sketch") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-cms")
    val in = s"$root/in"
    val ev = Tables.events(spark, sf)
      .filter($"user_id".isNotNull).select($"user_id")
    // two file drops → two micro-batches (maxFilesPerTrigger = 1)
    ev.filter($"user_id" % 2 === 0).coalesce(1).write.parquet(in)
    ev.filter($"user_id" % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(in)
    val q = graft.streaming.SketchStream.startHeavyHitterStream(
      spark, in, s"$root/state", s"$root/ckpt", maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    assert(spark.read.parquet(s"$root/state")
      .select($"batch_id").distinct().count() >= 2,
      "stream should have produced multiple batch partitions")
    val merged = graft.streaming.SketchStream.mergedCounters(spark, s"$root/state")
      .as[(Int, Long, Long)].collect().toSeq.sorted
    val batch = operators.SketchOps.cmsCounters(ev)
      .as[(Int, Long, Long)].collect().toSeq.sorted
    assert(merged === batch)
    // replay safety: reprocessing a batch overwrites, never
    // double-counts — replaying the FULL input as batch 0 twice leaves
    // batch 0 holding exactly one full-input partial
    graft.streaming.SketchStream.processSketchBatch(
      spark.read.parquet(in), s"$root/state", 0L)
    graft.streaming.SketchStream.processSketchBatch(
      spark.read.parquet(in), s"$root/state", 0L)
    val afterReplay = graft.streaming.SketchStream
      .mergedCounters(spark, s"$root/state")
      .agg(sum($"cnt")).as[Long].head()
    val nOdd = ev.filter($"user_id" % 2 =!= 0).count()
    assert(afterReplay ===
      operators.SketchOps.CmsRows * (ev.count() + nOdd),
      "batch 0 replay must overwrite its own partition")
  }

  test("x31 SQ8 ANN: reported sims are TRUE cosines; ranking is honest") {
    import graft.operators.{CoreQueries, SimilarityOps}
    val got = SimilarityOps.annSq8(spark, sf)
      .as[(Long, Double, Double)].collect()
    assert(got.length === SimilarityOps.TopK)
    // sims must equal the exact cosine of the same pairs (the rerank is
    // exact, only the CANDIDATE set is approximate)
    val exact = CoreQueries.knnCosine(spark, sf)
      .as[(Long, Double)].collect().toMap   // exact top-5 vs vec 0
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val probeE = emb.filter($"vec_id" === 0).select($"e")
      .as[Seq[Double]].head()
    val all = emb.filter($"vec_id" =!= 0).as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val allCos = all.map { case (id, e) =>
      id -> BigDecimal(cos(e, probeE))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble }.toMap
    got.foreach { case (id, est, sim) =>
      assert(math.abs(sim - allCos(id)) < 1e-9, s"sim of $id is not exact")
      // 8-bit quantization error on the estimate is small
      assert(math.abs(est - sim) < 0.05, s"estimate of $id too far off")
    }
    // descending, and the quantized retrieval found real structure:
    // every reported sim is at least the 20th-best exact cosine (the
    // dequantized ranking can only miss by quantization error)
    assert(got.map(-_._3).toSeq === got.map(-_._3).toSeq.sorted)
    val floor20 = allCos.values.toSeq.sorted.reverse.take(
      SimilarityOps.SqCandidates).min
    got.foreach { case (id, _, sim) =>
      assert(sim >= floor20 - 0.05, s"candidate $id far below exact floor") }
    assert(exact.nonEmpty)   // baseline sanity
  }

  test("TrainingDataDemo composes the curation stages coherently") {
    val out = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val (corpus, report) = TrainingDataDemo.run(spark, sf, Some(out))
    val counts = report.toMap
    // stages only ever shrink the corpus
    assert(counts("raw_documents") >= counts("after_gates_and_exact_dedup"))
    assert(counts("after_gates_and_exact_dedup") >=
      counts("after_near_dup_clustering"))
    assert(counts("after_near_dup_clustering") >=
      counts("after_decontamination"))
    assert(counts("after_decontamination") > 0)
    val rows = corpus.select($"doc_id", $"split").as[(Long, String)].collect()
    assert(rows.length.toLong === counts("after_decontamination"))
    // every survivor is its own cluster representative…
    val reps = operators.DedupOps.dedupClusters(spark, sf)
      .filter($"doc_id" === $"rep").select($"doc_id").as[Long].collect().toSet
    rows.foreach { case (id, _) => assert(reps(id), s"doc $id is not a rep") }
    // …no contaminated doc survived…
    val dirty = operators.DedupOps.contaminationEval(spark, sf)
      .select($"train_id").as[Long].collect().toSet
    rows.foreach { case (id, _) => assert(!dirty(id), s"doc $id contaminated") }
    // …and the written shards partition the corpus by split
    val written = spark.read.parquet(out)
    assert(written.count() === rows.length)
    assert(rows.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("x28 PII redaction: planted PII found and scrubbed") {
    val rows = operators.TextOps.piiRedaction(spark, sf)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, em, ip, ph, fp) =>
      assert(em >= 1, s"planted email missed in doc $id")
      assert(ip >= 1, s"planted ip missed in doc $id")
      assert(ph >= 1, s"planted phone missed in doc $id")
      assert(fp.length === 32)
    }
    // the redacted fingerprint differs from the fingerprint of the
    // AUGMENTED (pre-scrub) text — i.e. the scrub genuinely replaced
    // something; comparing against md5(text) would pass vacuously
    // because the augmentation alone changes the hash
    val aug = Tables.documents(spark, sf)
      .select($"doc_id",
        md5(operators.TextOps.piiAugmented($"text", $"doc_id")))
      .as[(Long, String)].collect().toMap
    rows.foreach { case (id, _, _, _, fp) => assert(fp !== aug(id)) }
  }
}
