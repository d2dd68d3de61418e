package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Invariants of the batch-assembly operators (x18/x19) that the SQL
  * oracle's hash-match can't express directly. */
class TextPipelineSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("x36 mixture plan matches driver-side water-filling; invariants hold") {
    val got = TextOps.mixturePlan(spark, sf)
      .as[(String, Long, Double, Long)].collect().toSeq
    // driver-side reference: textbook water-filling over the same
    // per-source token totals
    val tok = Tables.documents(spark, sf)
      .select($"source", size(split(trim($"text"), "\\s+")).cast("long"))
      .as[(String, Long)].collect()
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    val total = tok.values.sum
    val budget = total / TextOps.MixtureBudgetDen
    val asc = tok.toSeq.sortBy { case (s, t) => (t, s) }
    val k = asc.size
    var pre = 0L
    var cap = Double.NaN
    var pivotIdx = -1
    asc.zipWithIndex.foreach { case ((_, t), j) =>
      if (pivotIdx < 0) {
        val r = k - j
        if (t * r > budget - pre) { pivotIdx = j; cap = (budget - pre).toDouble / r }
        else pre += t
      }
    }
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = asc.zipWithIndex.map { case ((s, t), j) =>
      if (pivotIdx < 0 || j < pivotIdx) (s, t, 1.0, t)
      else (s, t, r(cap / t, 6), t * math.round(cap / t * 1e6) / 1000000L)
    }.sortBy(_._1)
    assert(got === want)
    // invariants: capped allocations never exceed whole-keep ones'
    // rule, and the total allocation lands within rounding slack of
    // the budget (one token per capped source)
    val allocSum = got.map(_._4).sum
    assert(allocSum <= budget)
    assert(allocSum >= budget - k, s"alloc $allocSum vs budget $budget")
    assert(got.exists(_._3 < 1.0), "budget < total must cap someone")
    got.foreach { case (_, t, rate, alloc) =>
      assert(alloc <= t && rate <= 1.0 && rate > 0.0)
    }
  }

  test("x37 report reconciles against the x07/x08/x09 audits") {
    val report = TextOps.corpusReport(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    // tokens per source == x09's ws_tokens
    val x09 = TextOps.textTokens(spark, sf)
      .select($"source", $"ws_tokens").as[(String, Long)].collect().toMap
    // language counts per source == x07's per-doc predictions
    val langs = Tables.documents(spark, sf).select($"doc_id", $"source")
      .join(TextOps.textLangId(spark, sf), "doc_id")
      .groupBy($"source").agg(
        sum(when($"pred_lang" === "en", 1L).otherwise(0L)).as("en"),
        sum(when($"pred_lang" === "und", 1L).otherwise(0L)).as("und"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // quality mass per source == the sum of x08's rounded per-doc scores
    val q4 = Tables.documents(spark, sf).select($"doc_id", $"source")
      .join(TextOps.textQuality(spark, sf), "doc_id")
      .groupBy($"source")
      .agg(sum(round($"quality" * 10000.0, 0).cast("long")).as("t"))
      .as[(String, Long)].collect().toMap
    assert(report.nonEmpty)
    report.foreach { case (src, r) =>
      assert(r.getLong(2) === x09(src), s"tokens $src")
      assert((r.getLong(5), r.getLong(6)) === langs(src), s"langs $src")
      assert(r.getLong(7) === q4(src), s"quality mass $src")
    }
  }

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

  /** English, punctuation-free, stopword-heavy → passes both gates. */
  private def enDoc(id: Long, content: String): (Long, String, String) =
    (id, "s1", s"the $content sat on the mat and it is a fine day in " +
      s"the sun of summer and the $content is in the end of it all")

  test("bounded curation: in-horizon dups dropped, expired-state dups pass") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-curbounded")
    val in = s"$root/in"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(plusSec: Long) = new java.sql.Timestamp(t0 + plusSec * 1000)
    val dupText = enDoc(1, "cat")._3
    // each call drops ONE file; mod-times are pinned so the file
    // source's batch order (maxFilesPerTrigger = 1) is deterministic
    var stamp = t0
    def drop(rows: (Long, String, java.sql.Timestamp)*): Unit = {
      val dir = new java.io.File(in)
      val before =
        Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName).toSet
      rows.map { case (id, text, t) => (id, "s1", text, t) }.toSeq
        .toDF("doc_id", "source", "text", "event_time")
        .coalesce(1).write.mode("append").parquet(in)
      stamp += 60000L
      dir.listFiles().filter(f => !before(f.getName))
        .foreach(_.setLastModified(stamp))
    }
    // batch 1: the original + an unrelated doc, both at t0
    drop((1L, dupText, ts(0)), (2L, enDoc(2, "violin")._3, ts(0)))
    // batch 2: an in-horizon duplicate (60 s < the 300 s horizon) that
    // must drop, plus a doc 2 h ahead that advances the watermark far
    // past doc 1's state expiry
    drop((3L, dupText, ts(60)), (4L, enDoc(4, "harbor")._3, ts(7200)))
    // batch 3: a fresh doc — state eviction runs at the END of a batch,
    // so this batch is where the now-stale t0 fingerprints get evicted
    // (watermark = t0 + 2 h − 300 s)
    drop((6L, enDoc(6, "meadow")._3, ts(7260)))
    // batch 4: the same text again, AFTER its state expired — passes
    // (the reference's 300 s TTL trade, not a bug)
    drop((5L, dupText, ts(7200)))
    val q = graft.streaming.DocCuration.startCurationBounded(
      spark, in, s"$root/out", s"$root/ckpt",
      maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    val kept = spark.read.parquet(s"$root/out")
      .select($"doc_id").as[Long].collect().toSet
    assert(Set(1L, 2L, 4L, 6L).subsetOf(kept))
    assert(!kept.contains(3L), "in-horizon duplicate must be dropped")
    assert(kept.contains(5L),
      "a dup arriving after state expiry passes — the documented TTL trade")
    // and the state is genuinely bounded: 4 distinct fingerprints were
    // seen, but the expired t0 entries were evicted along the way, so
    // the state never holds them all
    val totals = q.recentProgress.toSeq
      .flatMap(_.stateOperators.map(_.numRowsTotal))
    assert(totals.nonEmpty && totals.last < 4,
      s"state must shrink as the watermark passes old fingerprints: $totals")
  }

  test("near-dup gate: batch rules match a sequential reference fold") {
    import java.nio.file.Files
    val batches = Seq(
      Seq(enDoc(1, "cat"), enDoc(2, "quasar"), enDoc(3, "harbor")),
      // 4 = word-order shuffle of 1 (same simhash, same fp — but fp
      // dedup is per-batch, so only the BAND STATE can catch it here)
      Seq((4L, "s1", enDoc(1, "cat")._3.split(" ").reverse.mkString(" ")),
        enDoc(5, "violin")),
      Seq(enDoc(6, "quasar"), enDoc(7, "glacier")))
    val all = batches.flatten.toDF("doc_id", "source", "text")
    // expectations derive from the operator's own band table — the test
    // pins the GATE semantics (state handling, batch rules), while the
    // x03 oracle separately pins what simhash banding finds
    val bandMap = graft.operators.DedupOps
      .simhashBands(all.select($"doc_id", $"text"))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    var stateRef = Set.empty[(Int, Long)]
    val keptRef = scala.collection.mutable.ArrayBuffer[Long]()
    batches.foreach { b =>
      val b1 = b.map(_._1).filter(id => (bandMap(id) & stateRef).isEmpty)
      val kept = b1.filter(id => !b1.exists(o =>
        o < id && (bandMap(o) & bandMap(id)).nonEmpty))
      keptRef ++= kept
      stateRef ++= kept.flatMap(bandMap)
    }

    val root = Files.createTempDirectory("graft-ndgate")
    val out = s"$root/out"; val state = s"$root/state"
    batches.zipWithIndex.foreach { case (b, id) =>
      graft.streaming.DocCuration.processNearDupBatch(
        b.toDF("doc_id", "source", "text"), out, state, id.toLong)
    }
    val got = spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().sorted.toSeq
    assert(got === keptRef.sorted.toSeq)

    // at-least-once replay: re-running a batch with its own batch_id
    // must leave output AND state byte-identical (idempotent dynamic
    // partition overwrite + self-excluding state read)
    graft.streaming.DocCuration.processNearDupBatch(
      batches(1).toDF("doc_id", "source", "text"), out, state, 1L)
    val afterReplay = spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().sorted.toSeq
    assert(afterReplay === got)
    // the shuffled cross-batch copy is a GUARANTEED band collision
    // (simhash is token-order invariant) — the state must have caught it
    assert(!got.contains(4L))
    assert(got.contains(1L))
    // state holds exactly the survivors' bands
    val stateGot = spark.read.parquet(state)
      .select($"chunk", $"key").as[(Int, Long)].collect().toSet
    assert(stateGot === stateRef)
  }

  test("near-dup gate runs end-to-end as a stream over file drops") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-ndstream")
    val in = s"$root/in"
    // doc 11 uses an unrelated sentence — the shared enDoc template
    // would make it a true near-dup of 10 and the gate would (rightly)
    // drop one of them
    Seq(enDoc(10, "cat"),
      (11L, "s1", "it is a good day and the rain is far from the hills " +
        "of the north and it is the time of harvest in the valley and " +
        "all of it is going to plan for the winter stores"))
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(in)
    // second file: a shuffled copy of doc 10 — whichever batch order the
    // file source picks, exactly one of {10, 12} survives
    Seq((12L, "s1", enDoc(10, "cat")._3.split(" ").reverse.mkString(" ")))
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(in)
    val q = graft.streaming.DocCuration.startNearDupCuration(
      spark, in, s"$root/out", s"$root/ckpt", s"$root/state",
      maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000))
    val kept = spark.read.parquet(s"$root/out")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept.contains(11L))
    assert((kept & Set(10L, 12L)).size === 1)
    assert(spark.read.parquet(s"$root/state").count() > 0)
  }

  test("near-dup gate survives a batch that keeps zero docs") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-ndempty")
    val out = s"$root/out"; val state = s"$root/state"
    // batch 0: every doc fails the language gate → zero kept → the
    // state dir exists but holds no parquet files; batch 1 must read
    // that as EMPTY state, not crash on schema inference
    graft.streaming.DocCuration.processNearDupBatch(
      Seq((1L, "s1", "zzz qqq xxv kkw pqf zzz qqq xxv kkw pqf"))
        .toDF("doc_id", "source", "text"), out, state, 0L)
    graft.streaming.DocCuration.processNearDupBatch(
      Seq(enDoc(2, "meadow")).toDF("doc_id", "source", "text"),
      out, state, 1L)
    assert(spark.read.parquet(out).select($"doc_id").as[Long]
      .collect().toSeq === Seq(2L))
  }

  test("lm likelihood equals a driver-side bigram-model recompute") {
    val got = TextOps.lmLikelihood(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split("\\s+").toSeq) }
      .filter(_._2.length >= 2)
    val bgs = toks.flatMap { case (id, w) =>
      w.sliding(2).map(p => (id, p(0), p(1))) }
    val c12 = bgs.groupBy(x => (x._2, x._3)).view.mapValues(_.length.toLong).toMap
    val c1 = bgs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val v = toks.flatMap(_._2).distinct.length.toLong
    val ref = bgs.groupBy(_._1).map { case (id, bs) =>
      id -> ((bs.length.toLong, bs.map { case (_, w1, w2) =>
        ((c12((w1, w2)) + 1L) * TextOps.LmProbScale) / (c1(w1) + v) }.sum))
    }
    assert(got.length === ref.size)
    got.foreach { case (id, n, s, f) =>
      assert((n, s) === ref(id), s"lm score for doc $id")
      assert(f === (s < n * TextOps.LmFloorScaled))
    }
    // the threshold separates a real tail on the fixture
    assert(got.exists(_._4) && got.exists(!_._4))
  }

  test("x39 classifier score equals a driver-side hashed-weights recompute") {
    val got = TextOps.qualityClassifier(spark, sf)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    def weight(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"q_$tok".getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % TextOps.ClsWeightRange -
        TextOps.ClsHalf
    }
    val ref = Tables.documents(spark, sf)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
      .map { case (id, t) =>
        val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
        id -> ((toks.length.toLong, toks.map(weight).sum))
      }.toMap
    assert(got.length === ref.size)
    got.foreach { case (id, n, s, prob, keep) =>
      assert((n, s) === ref(id), s"classifier score for doc $id")
      assert(keep === (s >= 0L))
      val want = BigDecimal(1.0 / (1.0 +
        math.exp(-s / ((n + 1) * TextOps.ClsHalf.toDouble))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(prob === want, s"logistic for doc $id")
    }
    // the gate separates a real tail on the fixture
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("x48 dsir importance score equals a driver-side model recompute") {
    val got = TextOps.dsirWeights(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    val B = TextOps.DsirBuckets
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir_$tok".getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % B
    }
    val docsRef = Tables.documents(spark, sf)
      .select($"doc_id", lower($"text"), $"lang")
      .as[(Long, String, String)].collect()
      .map { case (id, t, lang) =>
        (id, t.split("\\s+").filter(_.nonEmpty).toSeq.map(bucket),
          lang == TextOps.DsirTargetLang)
      }
    val ctR = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val ctT = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    docsRef.foreach { case (_, bs, isT) =>
      bs.foreach { b => ctR(b) += 1; if (isT) ctT(b) += 1 }
    }
    val (rTot, tTot) = (ctR.values.sum, ctT.values.sum)
    def lr6(b: Long): Long = BigDecimal(
      (math.log((ctT(b) + 1.0) / (tTot + B)) -
        math.log((ctR(b) + 1.0) / (rTot + B))) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val ref = docsRef.collect { case (id, bs, _) if bs.nonEmpty =>
      id -> ((bs.length.toLong, bs.map(lr6).sum))
    }.toMap
    assert(got.length === ref.size)
    got.foreach { case (id, n, s, sel) =>
      assert((n, s) === ref(id), s"dsir score for doc $id")
      assert(sel === (s > n * TextOps.DsirFloorMicroNats))
    }
    // the threshold separates a real subset, and selection ENRICHES
    // the target language — the property DSIR exists to deliver
    assert(got.exists(_._4) && got.exists(!_._4))
    val langOf = Tables.documents(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    def enFrac(ids: Seq[Long]) =
      ids.count(langOf(_) == TextOps.DsirTargetLang).toDouble / ids.size
    val selIds = got.filter(_._4).map(_._1).toSeq
    assert(enFrac(selIds) > enFrac(got.map(_._1).toSeq),
      "selected docs should over-represent the target language")
  }

  test("x49 weighted sample equals a driver-side A-Res recompute") {
    val got = TextOps.weightedSample(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.length === TextOps.WrsK)
    // recompute every doc's priority from scratch: q4 weight via the
    // quality frame, 52-bit md5 uniform, ln(u)/w in nano-units
    val quality = TextOps.textQuality(spark, sf)
      .select($"doc_id", $"quality").as[(Long, Double)].collect().toMap
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val prios = texts.map { case (id, t) =>
      val w = BigDecimal(quality(id) * 10000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong + 1L
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wrs_$t".getBytes("UTF-8")).take(7)
        .map("%02x".format(_)).mkString.take(13)
      val h = java.lang.Long.parseLong(hex, 16)
      val key6 = BigDecimal(
        math.log((h + 1) / 4503599627370496.0) / w * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (id, w, key6)
    }
    val want = prios.sortBy { case (id, _, k) => (-k, id) }
      .take(TextOps.WrsK).toSeq
    assert(got === want)
    // the draw must actually be weighted: the selected docs' mean
    // weight exceeds the corpus mean (u^(1/w) stochastically dominates
    // for larger w)
    val meanSel = got.map(_._2).sum.toDouble / got.size
    val meanAll = prios.map(_._2).sum.toDouble / prios.length
    assert(meanSel > meanAll,
      s"weighted draw should favor heavy docs ($meanSel vs $meanAll)")
  }

  test("x41 chunks cover every token; fingerprints match a driver slice") {
    val got = TextOps.chunkDocuments(spark, sf)
      .as[(Long, Long, Long, String)].collect()
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSeq }
      .filter(_._2.nonEmpty).toMap
    val byDoc = got.groupBy(_._1)
    assert(byDoc.keySet === toks.keySet)
    byDoc.foreach { case (id, chunks) =>
      val n = toks(id).length
      val sorted = chunks.sortBy(_._2)
      // consecutive ids from 0, matching the ceil chunk-count rule
      assert(sorted.map(_._2).toSeq === (0L until sorted.length.toLong))
      assert(sorted.length ===
        1 + math.ceil(math.max(n - TextOps.ChunkSize, 0)
          / TextOps.ChunkStride.toDouble).toLong)
      sorted.foreach { case (_, c, len, fp) =>
        val start = (c * TextOps.ChunkStride).toInt
        assert(len === math.min(TextOps.ChunkSize, n - start), s"doc $id c $c")
        val window = toks(id).slice(start, start + TextOps.ChunkSize)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(window.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(fp === md, s"fp of doc $id chunk $c")
      }
      // the windows jointly cover [0, n)
      val covered = sorted.map { case (_, c, len, _) =>
        val s0 = (c * TextOps.ChunkStride).toInt; (s0, s0 + len.toInt) }
      assert(covered.head._1 === 0 && covered.map(_._2).max >= n)
      covered.toSeq.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 <= e1, "gap between chunks")
        case _ => ()
      }
    }
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

  test("x46 BPE pair counts equal a driver-side recompute") {
    val texts = Tables.documents(spark, sf)
      .select($"text").as[String].collect().toSeq
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for (t <- texts; w <- t.trim.toLowerCase.split("\\s+") if w.length >= 2;
         i <- 0 until (w.length - 1))
      counts(w.substring(i, i + 2)) = counts.getOrElse(w.substring(i, i + 2), 0L) + 1L
    val expected = counts.toSeq.map { case (p, n) => (p, n) }
      .sortBy { case (p, n) => (-n, p) }.take(TextOps.BpeTopPairs)
    val got = TextOps.bpePairs(spark, sf).as[(String, Long)].collect().toSeq
    assert(got === expected)
  }

  test("x52 temperature mixture equals a driver recompute and up-weights small sources") {
    val toks = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(_._2.trim.split("\\s+").length.toLong).sum).toMap
    val s6 = toks.view.mapValues(n => math.round(math.sqrt(n.toDouble) * 1e6)).toMap
    val t6 = s6.values.sum
    val total = toks.values.sum
    val budget = total / TextOps.MixtureBudgetDen
    val want = toks.keys.toSeq.sorted.map { src =>
      val p6 = s6(src) * 1000000L / t6
      (src, toks(src), p6,
        BigDecimal(s6(src).toDouble / t6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        (budget / 1000000L) * p6 + ((budget % 1000000L) * p6) / 1000000L)
    }
    val got = TextOps.temperatureMixture(spark, sf)
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(got === want)
    // τ = 1/2 up-weights small sources: sampled share / natural share
    // must strictly DECREASE as source size increases
    val bySize = got.sortBy(_._2)
    val boost = bySize.map(r => r._3.toDouble * total / (1e6 * r._2))
    assert(boost.zip(boost.tail).forall { case (a, b) => a > b },
      s"boost should decrease with size: $boost")
    assert(got.map(_._5).sum <= budget,
      "allocations never exceed the budget")
    assert(got.map(_._3).sum <= 1000000L, "shares are a sub-probability")
  }

  test("x55 unimax mixture equals the paper's iterative loop; both regimes bind") {
    val toks = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(_._2.trim.split("\\s+").length.toLong).sum).toMap
    val caps = toks.view.mapValues(n =>
      (n / 1000000L) * TextOps.UniMaxEpochCap6 +
        ((n % 1000000L) * TextOps.UniMaxEpochCap6) / 1000000L).toMap
    val budget =
      toks.values.sum * TextOps.UniMaxBudgetNum / TextOps.UniMaxBudgetDen
    // the paper's algorithm, literally: uniform share over the pool;
    // any source whose cap is at or below its share takes the cap and
    // leaves; repeat until no source binds
    var pool = toks.keys.toSeq
    var rem = budget
    val alloc = scala.collection.mutable.Map[String, Long]()
    var progressed = true
    while (progressed && pool.nonEmpty) {
      val share = rem / pool.size
      val bound = pool.filter(s => caps(s) <= share)
      progressed = bound.nonEmpty
      bound.foreach { s => alloc(s) = caps(s); rem -= caps(s) }
      pool = pool.filterNot(bound.contains)
    }
    if (pool.nonEmpty) {
      val level = rem / pool.size
      val extra = rem % pool.size
      pool.sortBy(s => (caps(s), s)).zipWithIndex.foreach { case (s, i) =>
        alloc(s) = level + (if (i < extra) 1L else 0L)
      }
    }
    val want = toks.keys.toSeq.sorted.map { src =>
      (src, toks(src), caps(src), alloc(src),
        BigDecimal(alloc(src).toDouble / toks(src))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = TextOps.unimaxMixture(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got === want)
    // the fixture must exercise BOTH regimes, and a bound budget is
    // exhausted exactly when someone is uncapped
    val nCapped = got.count(r => r._4 == r._3)
    assert(nCapped > 0 && nCapped < got.size,
      s"expected a mixed capped/uncapped outcome, got $nCapped of ${got.size}")
    assert(got.map(_._4).sum === budget,
      "with an uncapped pool the budget is spent exactly")
    // fairness: every uncapped source receives within one token of the
    // same allocation, and no source exceeds its cap
    val uncapped = got.filter(r => r._4 != r._3).map(_._4)
    assert(uncapped.max - uncapped.min <= 1L)
    assert(got.forall(r => r._4 <= r._3))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("x62 mixture fill takes per-source hash-order prefixes that meet the allocation") {
    val got = TextOps.mixtureFill(spark, sf)
      .as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._1) === got.map(_._1).sorted, "doc_id-ordered output")
    // the solved allocation, via the same parameterized waterfill the
    // operator uses (its own equivalence to the paper's loop is the
    // x55 test above)
    val alloc = TextOps.unimaxFromCounts(
        Tables.documents(spark, sf).select($"source",
            TextOps.nTokensCol($"text").as("nt"))
          .groupBy($"source").agg(sum($"nt").as("tokens")),
        TextOps.FillBudgetNum, TextOps.FillBudgetDen)
      .select($"source", $"alloc").as[(String, Long)].collect().toMap
    // driver recompute of the fill rule from raw text
    val raw = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)]
      .collect()
    val want = raw.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      var cum = 0L
      ds.map { case (id, _, t) =>
          (id, t.trim.split("\\s+").length.toLong, md5hex("fill_" + t))
        }
        .sortBy { case (id, _, fk) => (fk, id) }.zipWithIndex
        .map { case ((id, nt, _), i) =>
          val before = cum; cum += nt
          (id, src, nt, i + 1L, before, before < alloc(src))
        }
    }.sortBy(_._1)
    assert(got === want)
    got.groupBy(_._2).foreach { case (src, rows) =>
      val inOrder = rows.sortBy(_._4)
      // taken docs form a pos-prefix
      val taken = inOrder.takeWhile(_._6)
      assert(inOrder.drop(taken.length).forall(!_._6), s"$src prefix")
      val total = inOrder.map(_._3).sum
      val a = alloc(src)
      if (a >= total) assert(taken.length === inOrder.length,
        s"$src: alloc covers the source, everything taken")
      else {
        // budget met, and minimally so: dropping the boundary doc
        // would leave the allocation unmet
        val sum = taken.map(_._3).sum
        assert(sum >= a, s"$src fill $sum under alloc $a")
        assert(sum - taken.last._3 < a, s"$src overfilled")
      }
    }
    // the 0.4× budget actually bites on the fixture: both verdicts
    // occur, and roughly the budgeted token fraction survives
    val takenTok = got.filter(_._6).map(_._3).sum.toDouble
    val allTok = got.map(_._3).sum.toDouble
    assert(got.exists(_._6) && got.exists(!_._6))
    assert(takenTok / allTok > 0.35 && takenTok / allTok < 0.5,
      s"taken fraction ${takenTok / allTok}")
  }

  test("x53 training order equals a driver recompute; positions are contiguous per shard") {
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val want = texts
      .map { case (id, t) =>
        val shard = (BigInt(md5hex("shard_" + t).take(8), 16) % TextOps.NumShards).toInt
        (id, shard, md5hex("ord_" + t))
      }
      .groupBy(_._2).toSeq.flatMap { case (shard, rows) =>
        rows.sortBy(r => (r._3, r._1)).zipWithIndex
          .map { case ((id, _, _), i) => (id, shard, i + 1L) }
      }.sortBy(r => (r._2, r._3))
    val got = TextOps.trainingOrder(spark, sf)
      .as[(Long, Int, Long)].collect().toSeq
    assert(got === want)
    // every shard's positions are 1..count (a valid permutation), and
    // the fixture actually spreads docs across shards
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted === (1L to rows.length).toSeq,
        s"shard $shard positions")
    }
    assert(got.map(_._2).distinct.size > 1, "docs should spread over shards")
  }

  test("x54 perplexity buckets equal a driver recompute; thirds are deterministic") {
    val scored = TextOps.lmLikelihood(spark, sf)
      .select($"doc_id", $"n_bigrams", $"sum_scaled_p")
      .as[(Long, Long, Long)].collect()
    val ppt = scored.map { case (id, nb, ssp) => (id, ssp / nb) }
    val n = ppt.length.toLong
    val sortedP = ppt.map(_._2).sorted
    def thresh(k: Long): Long = {
      // smallest p whose ascending cumulative count exceeds k
      var cum = 0L
      sortedP.find { _ => { cum += 1; cum > k } }.get
    }
    val t1 = thresh(n / 3)
    val t2 = thresh(2 * n / 3)
    val want = ppt.map { case (id, p) =>
      (id, p, if (p > t2) "head" else if (p > t1) "middle" else "tail")
    }.sortBy(_._1).toSeq
    val got = TextOps.perplexityBuckets(spark, sf)
      .as[(Long, Long, String)].collect().toSeq
    assert(got === want)
    val sizes = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.keySet === Set("head", "middle", "tail"),
      "all three buckets should be populated")
  }

  test("x58 shard manifest: totals reconcile, digests merge, " +
      "partitioning-invariant") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val got = TextOps.shardManifestOf(docs)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    // totals reconcile against the corpus
    assert(got.map(_._2).sum === docs.count())
    assert(got.map(_._1) === got.map(_._1).sorted, "ordered by shard")
    // digest per shard equals a driver-side XOR over that shard's docs,
    // and the manifest shard equals the x53 writer's placement
    val placed = TextOps.trainingOrderOf(docs)
      .select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
    val perDoc = docs.select($"doc_id",
        conv(substring(md5($"text"), 1, 15), 16, 10).cast("long"),
        size(split(trim($"text"), "\\s+")).cast("long"))
      .as[(Long, Long, Long)].collect()
    val wantDigest = perDoc.groupBy(r => placed(r._1))
      .view.mapValues(_.map(_._2).reduce(_ ^ _)).toMap
    val wantTokens = perDoc.groupBy(r => placed(r._1))
      .view.mapValues(_.map(_._3).sum).toMap
    got.foreach { case (shard, _, nTokens, digest, minId, maxId) =>
      assert(digest === wantDigest(shard))
      assert(nTokens === wantTokens(shard))
      assert(minId <= maxId)
    }
    // the digest is an algebraic partial: input partitioning can't move it
    val re = TextOps.shardManifestOf(docs.repartition(13, $"doc_id"))
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(re === got)
  }

  test("x59 blocklist gate: planted truth table") {
    val planted = Seq(
      (1L, "a dup row"),                    // single word hit
      (2L, "the SLOW JOIN path"),           // case-folded phrase hit
      (3L, "slow joins here"),              // no whole-word phrase match
      (4L, "big sort and a dup and a fast scan"), // three hits, one each
      (5L, "clean text entirely"),          // no hit
      (6L, "dup dup dup"))                  // repeated word counts once
      .toDF("doc_id", "text")
    val got = TextOps.blocklistFilterOf(planted)
      .as[(Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, "dup"),
      (2L, 1L, "slow join"),
      (4L, 3L, "big sort,dup,fast scan"),
      (6L, 1L, "dup")))
  }

  test("x68: window profile replays from driver windowing over x07 votes") {
    // rebuild the windows in plain Scala, vote each with the
    // x07-validated langIdCol (one DataFrame pass over the window
    // strings), aggregate in the driver — the operator's fused
    // window+vote+aggregate plan must produce the same profile
    graft.plans.GraftExpressions.register(spark)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val windows = docs.flatMap { case (id, t) =>
      val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.grouped(TextOps.MixWindow).map(w => (id, w.mkString(" ")))
    }.toSeq
    val votes = windows.toDF("doc_id", "wt")
      .select($"doc_id", TextOps.langIdCol($"wt").as("wlang"))
      .as[(Long, String)].collect()
    val want = votes.groupBy(_._1).map { case (id, vs) =>
      val langs = vs.map(_._2)
      (id, langs.size.toLong, langs.distinct.size.toLong,
        langs.count(_ == "en").toLong, langs.count(_ == "und").toLong,
        langs.distinct.size > 1)
    }.toSeq.sortBy(_._1)
    val got = TextOps.mixedLanguage(spark, sf)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got === want)
    // the window mechanism genuinely discriminates on this corpus:
    // some docs are mixed, some are not
    assert(got.exists(_._6) && got.exists(!_._6))
  }

  test("x70 quality gate: clean per-source cut; sketch twin agrees within one rank") {
    val exact = TextOps.qualityGate(spark, sf)
      .as[(Long, String, Long)].collect().toSeq
    assert(exact.nonEmpty)
    val all = TextOps.textQuality(spark, sf)
      .select($"doc_id", round($"quality" * 1e6, 0).cast("long"))
      .as[(Long, Long)].collect().toMap
    val srcOf = Tables.documents(spark, sf).select($"doc_id", $"source")
      .as[(Long, String)].collect().toMap
    val keptBySrc = exact.groupBy(_._2)
    // the cut is clean: within a source, every kept doc outscores
    // every dropped doc (gate is q >= threshold, drops are strictly
    // below it)
    srcOf.groupBy(_._2).foreach { case (src, docs) =>
      val kept = keptBySrc.getOrElse(src, Nil).map(_._1).toSet
      val (k, d) = docs.keys.partition(kept)
      assert(k.nonEmpty, s"$src keeps its top quantile")
      if (d.nonEmpty)
        assert(k.map(all).min > d.map(all).max, s"$src cut not clean")
      // roughly the top quarter survives (ties can widen it)
      assert(k.size.toDouble / docs.size >= 0.2, s"$src keep rate")
    }
    // the GK-sketch twin picks a threshold within one rank of exact:
    // per source the two gates disagree on at most one document
    val sketch = TextOps.qualityGateSketch(spark, sf)
      .as[(Long, String, Long)].collect().toSeq
    val sBySrc = sketch.groupBy(_._2)
    (keptBySrc.keySet ++ sBySrc.keySet).foreach { src =>
      val e = keptBySrc.getOrElse(src, Nil).map(_._1).toSet
      val s2 = sBySrc.getOrElse(src, Nil).map(_._1).toSet
      assert(((e diff s2) ++ (s2 diff e)).size <= 1, s"$src twin drift")
    }
  }

  test("x74 diff: driver recompute; reordered twins count as retained") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def isOld(text: String): Boolean =
      java.lang.Long.parseLong(md5hex(text).substring(0, 8), 16) % 2 == 0
    def fp(text: String): String =
      md5hex(text.toLowerCase.split("\\s+").sorted.mkString(" "))
    // plant a reordered-twin pair whose two exact texts land on
    // OPPOSITE sides of the membership bit — searched, not assumed,
    // so the test cannot silently stop exercising "retained"
    val base = "alpha beta gamma delta epsilon"
    val twin = (1 to 200).iterator
      .map(i => s"alpha beta gamma delta epsilon pad$i")
      .map(t => (s"$t", t.split(" ").reverse.mkString(" ")))
      .find { case (a, b) => fp(a) == fp(b) && isOld(a) != isOld(b) }
    assert(twin.isDefined, "searchable twin must exist")
    val (ta, tb) = twin.get
    val planted = Seq(
      ("srcA", ta), ("srcA", tb),          // retained via reorder
      ("srcA", base),                      // single doc, one side only
      ("srcB", "one two three"), ("srcB", "four five six"))
      .toDF("source", "text")
    val gotRows = TextOps.snapshotDiffOf(planted)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // driver reference over the planted frame
    def ref(rows: Seq[(String, String)]): Map[String, (Long, Long, Long)] =
      rows.groupBy(_._1).map { case (src, docs) =>
        val groups = docs.map(_._2).distinct.groupBy(fp)
        val (ret, add, rem) = groups.values.foldLeft((0L, 0L, 0L)) {
          case ((r, a, d), texts) =>
            val old = texts.exists(isOld)
            val nw = texts.exists(t => !isOld(t))
            if (old && nw) (r + 1, a, d)
            else if (nw) (r, a + 1, d) else (r, a, d + 1)
        }
        src -> ((ret, add, rem))
      }
    assert(gotRows === ref(planted.as[(String, String)].collect().toSeq))
    assert(gotRows("srcA")._1 === 1L, "the reordered twin must be retained")
    // and the corpus query agrees with the same reference on testdata
    val corpus = Tables.documents(spark, sf).select($"source", $"text")
      .as[(String, String)].collect().toSeq
    val corpusGot = TextOps.snapshotDiff(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(corpusGot === ref(corpus))
  }

  test("x75 histogram: buckets are exact log2 floors; masses reconcile with x09") {
    val got = TextOps.lengthHistogram(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    // per-source token mass equals the x09 audit's
    val x09 = TextOps.textTokens(spark, sf)
      .select($"source", $"ws_tokens").as[(String, Long)].collect().toMap
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._4).sum === x09(src), s"$src token mass")
    }
    // bucket identity: recompute per doc on the driver
    val ref = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
      .map { case (src, t) =>
        val n = t.trim.split("\\s+").length.toLong
        (src, 63L - java.lang.Long.numberOfLeadingZeros(n))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (src, bucket, nDocs, _) =>
      assert(ref((src, bucket)) === nDocs, s"($src, $bucket)")
    }
  }
}
