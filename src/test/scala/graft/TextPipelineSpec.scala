package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Invariants of the batch-assembly operators (x18/x19) that the SQL
  * oracle's hash-match can't express directly. */
class TextPipelineSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("packing partitions the corpus: every doc in exactly one bin") {
    val packed = TextOps.packSequences(spark, sf)
    val docTotal = Tables.documents(spark, sf).count()
    assert(packed.agg(sum($"n_docs")).as[Long].head() === docTotal)
    // every source starts at bin 0 (cum-before of the first doc is 0);
    // bins may legitimately SKIP indices when one doc spans multiple
    // budgets, so consecutiveness is NOT asserted
    val firstBins = packed.groupBy($"source").agg(min($"bin").as("b"))
      .filter($"b" =!= 0L).count()
    assert(firstBins === 0)
  }

  test("packing respects the running-total budget rule") {
    // a bin other than the last of its source must have crossed the
    // budget by its end (otherwise the next doc would have joined it)
    val packed = TextOps.packSequences(spark, sf).collect()
    val bySource = packed.groupBy(_.getString(0))
    bySource.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      var cum = 0L
      sorted.dropRight(1).foreach { r =>
        cum += r.getLong(3)   // total_tokens
        assert(cum >= TextOps.PackBudget * (r.getLong(1) + 1),
          "non-final bin ended before reaching its budget boundary")
      }
    }
  }

  test("packing matches a sequential per-source reference fold") {
    val got = TextOps.packSequences(spark, sf)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        size(split(trim($"text"), "\\s+")).cast("long").as("t"))
      .as[(Long, String, Long)].collect()
    val want = toks.groupBy(_._2).flatMap { case (src, rows) =>
      var cum = 0L
      val bins = rows.sortBy(_._1).map { case (_, _, t) =>
        val bin = cum / TextOps.PackBudget
        cum += t
        (bin, t)
      }
      bins.groupBy(_._1).map { case (bin, xs) =>
        ((src, bin), (xs.length.toLong, xs.map(_._2).sum))
      }
    }
    assert(got === want)
  }

  test("sample keep-decision matches a driver-side md5 recompute") {
    val kept = TextOps.stratifiedSample(spark, sf)
      .select($"source", $"n_kept").as[(String, Long)].collect().toMap
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(text: String): Long = {
      val hex = md.digest(text.getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 1000L
    }
    val want = docs.groupBy(_._1).map { case (src, rows) =>
      val rate = 100L + (src.last.toLong % 10) * 50L
      src -> rows.count(r => bucket(r._2) < rate).toLong
    }
    assert(kept === want)
  }

  test("streaming curation equals the batch gates + dedup (parity)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft-curation")
    val in = root.resolve("in"); Files.createDirectories(in)
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      in.resolve("documents.parquet"))
    val q = graft.streaming.DocCuration.startCuration(
      spark, in.toString, s"$root/out", s"$root/ckpt")
    assert(q.awaitTermination(120000))
    val streamed = spark.read.parquet(s"$root/out")
      .select($"fp").as[String].collect().toSet
    val batch = graft.streaming.DocCuration.curateBatch(
        Tables.documents(spark, sf))
      .select($"fp").as[String].collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("stratified sample is bounded, stratified, and deterministic") {
    val a = TextOps.stratifiedSample(spark, sf).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val (total, kept, rate) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept >= 0 && kept <= total)
      assert(rate >= 100 && rate <= 550)
    }
    val b = TextOps.stratifiedSample(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
  }
}
