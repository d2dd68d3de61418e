package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.functions.GhFunctions

/** Property-based invariants (SURVEY §5.2.3), using scalacheck
  * generators with each property evaluated in ONE DataFrame pass (a
  * per-sample driver loop of Spark jobs would take minutes). */
class PropertySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val loginGen: Gen[String] = for {
    base <- Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("bot", "aws", "ci-", "-ci", "build", "release", "copilot",
        "renovate", "security", "deploy", "[bot]", "snyk"),
      for (a <- Gen.alphaStr.map(_.take(6)); b <- Gen.oneOf("bot", "-bot", "[bot]", ""))
        yield a + b)
  } yield base

  test("F2 folded regex ≡ unfolded predicates on generated logins") {
    val logins = Gen.listOfN(500, loginGen).sample.get.distinct
    val df = logins.toDF("login")
      .select(GhFunctions.isBotBatch($"login").as("a"),
              GhFunctions.isBotBatchUnfolded($"login").as("b"))
    assert(df.filter($"a" =!= $"b").count() === 0)
  }

  test("rollup invariant: Σ daily == Σ hourly == total, random events") {
    val rng = new scala.util.Random(7)
    val events = Seq.fill(2000) {
      val day = 1 + rng.nextInt(3)
      val ts = f"2025-03-0$day%d ${rng.nextInt(24)}%02d:${rng.nextInt(60)}%02d:00"
      (ts, s"user${rng.nextInt(20)}")
    }.toDF("ts_s", "login")
      .select(to_timestamp($"ts_s").as("created_at"), $"login")
    val hourly = events
      .groupBy(date_trunc("hour", $"created_at").as("hour"), $"login")
      .agg(count("*").as("score"))
    val daily = hourly
      .groupBy(date_trunc("day", $"hour").as("day"), $"login")
      .agg(sum($"score").as("score"))
    val total = events.count()
    assert(hourly.agg(sum($"score")).as[Long].head() === total)
    assert(daily.agg(sum($"score")).as[Long].head() === total)
  }

  test("dedup idempotence: f(xs ++ xs) == f(xs), random ids") {
    val rng = new scala.util.Random(11)
    val xs = Seq.fill(500)((rng.nextInt(200).toString,
      f"2025-03-01 ${rng.nextInt(24)}%02d:00:00"))
      .toDF("id", "ts_s")
      .select($"id", to_timestamp($"ts_s").as("created_at"))
    val once = graft.streaming.GhIngest.dedupEvents(xs)
      .select($"id").as[String].collect().sorted.toSeq
    val twice = graft.streaming.GhIngest.dedupEvents(xs.unionAll(xs))
      .select($"id").as[String].collect().sorted.toSeq
    assert(once === twice)
    assert(once.distinct === once)
  }

  test("LongDotProduct ≡ BigInt model on random quantized vectors") {
    graft.plans.GraftExpressions.register(spark)
    val rng = new scala.util.Random(17)
    // quantized-coordinate range: |x| ≤ 1e6 (round(±1.0 · 1e6))
    val rows = Seq.fill(200)((
      Seq.fill(64)(rng.nextLong() % 1000000L),
      Seq.fill(64)(rng.nextLong() % 1000000L)))
    val got = rows.toDF("a", "b")
      .select(call_function(graft.plans.GraftExpressions.LongDotFn,
        $"a", $"b").as("d"))
      .as[Long].collect().toSeq
    val want = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum.toLong
    }
    assert(got === want)   // also proves no silent 64-bit overflow here
  }

  test("quantize matches half-away-from-zero rounding incl. negatives") {
    val xs = Seq(0.0000005, -0.0000005, 0.0000014999, -0.0000014999,
      0.9999995, -0.9999995, 0.123456749, -0.123456749, 1.0, -1.0)
    val got = xs.map(x => Seq(x)).toDF("v")
      .select(graft.operators.SimilarityOps.quantize($"v").as("q"))
      .as[Seq[Long]].collect().map(_.head).toSeq
    val want = xs.map(x => BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    assert(got === want)
  }

  test("x36 alloc split-product ≡ BigInt model at 100 TB token counts") {
    // the divide-before-multiply form must equal floor(tokens·r6i/10⁶)
    // exactly, INCLUDING token counts where the naive product wraps
    // 2^63 (the design target is ~2.5e13 tokens per source)
    val gen = for {
      tokens <- Gen.oneOf(Gen.chooseNum(0L, 1000000L),
        Gen.chooseNum(1L, 30000000000000L))   // up to 3e13
      r6i <- Gen.chooseNum(0L, 1000000L)
    } yield (tokens, r6i)
    val cases = Gen.listOfN(400, gen).sample.get :+
      ((25000000000000L, 999999L)) :+ ((9300000000000L, 1000000L))
    val got = cases.toDF("tokens", "r6i")
      .select($"tokens", $"r6i",
        expr("(tokens div 1000000) * r6i + ((tokens % 1000000) * r6i) div 1000000")
          .as("alloc"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (t, r, alloc) =>
      val want = (BigInt(t) * BigInt(r) / BigInt(1000000)).toLong
      assert(alloc === want, s"alloc($t, $r)")
      assert(alloc >= 0L, s"negative alloc at ($t, $r) — overflow")
    }
  }

  test("md5 token-hash column ≡ JVM MessageDigest model (x03 hash)") {
    val toks = Seq("the", "quick", "Brown", "fox", "", "déjà", "42")
    val got = toks.toDF("t")
      .select(conv(substring(md5($"t"), 1, 15), 16, 10).cast("long").as("h"))
      .as[Long].collect().toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = toks.map { t =>
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    assert(got === want)
  }

  test("minhash similarity estimate correlates with exact jaccard") {
    // deterministic pseudo-random shingle-hash sets with controlled overlap
    graft.plans.GraftExpressions.register(spark)
    val rng = new scala.util.Random(13)
    val base = Seq.fill(300)(rng.nextLong().abs % 4294967296L)
    def mutate(keep: Int): Seq[Long] =
      base.take(keep) ++ Seq.fill(300 - keep)(rng.nextLong().abs % 4294967296L)
    val rows = Seq(
      (1.0, base, base),
      (0.8, base, mutate(265)),   // |∩|≈265, |∪|≈335 → j≈0.79
      (0.1, base, mutate(55)))
    rows.foreach { case (expectedJ, a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
        .select(
          call_function(graft.plans.GraftExpressions.MinHashFn, $"a").as("sa"),
          call_function(graft.plans.GraftExpressions.MinHashFn, $"b").as("sb"))
        .select(expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), p -> p))")
          .cast("double").as("matches"))
      val est = df.as[Double].head() / plans.MinHashSignature.NumHashes
      assert(math.abs(est - expectedJ) < 0.15,
        s"minhash estimate $est vs expected ≈$expectedJ")
    }
  }

  test("x43 span core on generated corpora ≡ plain-Scala recompute") {
    // planted shared passages (adjacent/overlapping windows, multiple
    // spans per doc, one full copy) over a vocabulary wide enough that
    // spurious cross-doc 8-grams are impossible (40^8 shapes), so every
    // span the operator finds must trace to a plant — and vice versa
    val rng = new scala.util.Random(29)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    val k = operators.DedupOps.SubstringGramK
    val base = scala.collection.mutable.Map.empty[Long, Vector[String]]
    (0 until 30).foreach { id =>
      base(id.toLong) =
        Vector.fill(10 + rng.nextInt(50))(vocab(rng.nextInt(vocab.size)))
    }
    (0 until 12).foreach { _ =>
      val a = rng.nextInt(30).toLong
      val b = rng.nextInt(30).toLong
      if (a != b && base(a).size > k) {
        val len = k + rng.nextInt(13)
        val s = rng.nextInt(math.max(1, base(a).size - len))
        val passage = base(a).slice(s, s + len)
        val at = rng.nextInt(base(b).size + 1)
        base(b) = base(b).patch(at, passage, 0)
      }
    }
    base(30L) = base(0L) // whole-doc copy
    val docs = base.toSeq.map { case (id, w) => (id, w.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = operators.DedupOps.substringSpansOf(docs)
      .select($"doc_id", $"s", $"e")
      .as[(Long, Int, Int)].collect().toSeq.sorted
    val gramDocs = base.toSeq
      .flatMap { case (id, w) =>
        w.sliding(k).map(_.mkString(" ")).map(g => (g, id)).toSeq
      }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val expected = base.toSeq.filter(_._2.size >= k).flatMap { case (id, w) =>
      val marked = w.sliding(k).zipWithIndex.collect {
        case (g, i) if gramDocs(g.mkString(" ")) >= 2 => i
      }.toSeq
      marked.foldLeft(List.empty[(Int, Int)]) {
        case ((ps, pe) :: rest, i) if i <= pe => (ps, math.max(pe, i + k - 1)) :: rest
        case (acc, i) => (i, i + k - 1) :: acc
      }.map { case (s, e) => (id, s, e) }
    }.sorted
    assert(got === expected)
    assert(got.nonEmpty && got.map(_._1).distinct.size > 2,
      "plants should produce spans across several docs")
  }

  test("x51/x52/x53 are partitioning-invariant (retry-stable) on the fixture") {
    // the same frame re-partitioned arbitrarily must produce the SAME
    // rows — the no-float-accumulation discipline made observable: a
    // shuffle-order change (retry, AQE re-plan, cluster resize) cannot
    // move a doc across a gate or a shard
    import graft.operators.{DedupOps, TextOps}
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text")
    val scrambled = docs.repartition(7, $"text").sortWithinPartitions($"text")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    assert(rows(DedupOps.gopherRepetitionOf(docs)) ===
      rows(DedupOps.gopherRepetitionOf(scrambled)))
    assert(rows(TextOps.temperatureMixtureOf(docs)) ===
      rows(TextOps.temperatureMixtureOf(scrambled)))
    assert(rows(TextOps.trainingOrderOf(docs)) ===
      rows(TextOps.trainingOrderOf(scrambled)))
    assert(rows(TextOps.unimaxMixtureOf(docs)) ===
      rows(TextOps.unimaxMixtureOf(scrambled)))
    assert(rows(TextOps.mixtureFillOf(docs)) ===
      rows(TextOps.mixtureFillOf(scrambled)))
    def halves(f: org.apache.spark.sql.DataFrame) =
      (f.filter($"doc_id" % 2 === 0), f.filter($"doc_id" % 2 === 1))
    val (c1, b1) = halves(docs)
    val (c2, b2) = halves(scrambled)
    assert(rows(DedupOps.snapshotDedupOf(c1, b1)) ===
      rows(DedupOps.snapshotDedupOf(c2, b2)))
  }

  test("PhrasePositions ≡ naive sliding scan on generated token arrays") {
    // tiny vocabulary so the phrase genuinely occurs (incl. overlapping
    // and back-to-back repeats); one DataFrame pass over all samples
    graft.plans.GraftExpressions.register(spark)
    val phrase = Seq("a", "b", "a")
    val tokGen = Gen.listOf(Gen.oneOf("a", "b", "c"))
    val samples = Gen.listOfN(400, tokGen).sample.get
    val want = samples.map { toks =>
      toks.sliding(phrase.size).zipWithIndex
        .collect { case (w, i) if w == phrase => i + 1 }.toSeq
    }
    val got = samples.map(Tuple1(_)).toDF("toks")
      .select(call_function(graft.plans.GraftExpressions.PhrasePosFn,
        $"toks", lit(phrase.mkString(","))).as("ps"))
      .as[Seq[Int]].collect().toSeq
    assert(got === want)
    assert(want.exists(_.size > 1), "generator should produce repeats")
  }

  test("gharchive hour walk ≡ Instant arithmetic across day/month/year bounds") {
    import graft.sources.GhArchiveSource
    val dayGen = for {
      y <- Gen.choose(2015, 2026); m <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28); h <- Gen.choose(0, 23)
      len <- Gen.choose(0, 80)
    } yield (java.time.LocalDate.of(y, m, d), h, len)
    dayGen.sample.toSeq ++ Gen.listOfN(40, dayGen).sample.get foreach {
      case (d0, h0, len) =>
        val from = d0.atStartOfDay(java.time.ZoneOffset.UTC).plusHours(h0)
        val to = from.plusHours(len)
        val got = GhArchiveSource.hoursInRange(
          s"${d0}-$h0", s"${to.toLocalDate}-${to.getHour}")
        // one partition per hour, inclusive, in walk order
        assert(got.size === len + 1)
        assert(got.head === (d0.toString, h0))
        assert(got.last === (to.toLocalDate.toString, to.getHour))
        // consecutive entries are exactly one hour apart
        got.sliding(2).foreach {
          case Seq((da, ha), (db, hb)) =>
            val a = java.time.LocalDate.parse(da)
              .atStartOfDay(java.time.ZoneOffset.UTC).plusHours(ha)
            assert(a.plusHours(1) ===
              java.time.LocalDate.parse(db)
                .atStartOfDay(java.time.ZoneOffset.UTC).plusHours(hb))
          case _ =>
        }
    }
    // a december-31 range crosses the year boundary correctly
    assert(GhArchiveSource.hoursInRange("2023-12-31-23", "2024-01-01-1") ===
      Seq(("2023-12-31", 23), ("2024-01-01", 0), ("2024-01-01", 1)))
  }

  test("gharchive pruning never drops a matching hour (matches ⊇ residual truth)") {
    import graft.sources.GhArchiveSource
    import org.apache.spark.sql.sources._
    val hours = GhArchiveSource.hoursInRange("2024-02-28-0", "2024-03-02-23")
    val filters: Seq[Filter] = Seq(
      EqualTo("date", "2024-02-29"), EqualTo("hour", 5),
      GreaterThan("hour", 20), LessThanOrEqual("hour", 3),
      GreaterThanOrEqual("date", "2024-03-01"), LessThan("date", "2024-03-01"),
      In("hour", Array(0, 12, 23)), In("date", Array("2024-03-02")))
    // every accepted filter shape prunes to EXACTLY the rows a full
    // scan + row filter would keep — partition-level pruning and
    // row-level residual evaluation must agree, or pruning loses data
    filters.filter(GhArchiveSource.accepts).foreach { f =>
      val pruned = hours.filter { case (d, h) =>
        GhArchiveSource.matches(d, h, f) }
      val truth = hours.filter { case (d, h) =>
        f match {
          case EqualTo("date", v) => d == v
          case EqualTo("hour", v) => h == v.asInstanceOf[Int]
          case GreaterThan("hour", v) => h > v.asInstanceOf[Int]
          case LessThanOrEqual("hour", v) => h <= v.asInstanceOf[Int]
          case GreaterThanOrEqual("date", v) => d >= v.toString
          case LessThan("date", v) => d < v.toString
          case In("hour", vs) => vs.exists(_.asInstanceOf[Int] == h)
          case In("date", vs) => vs.exists(_.toString == d)
          case _ => true
        }
      }
      assert(pruned === truth, s"$f")
    }
    // an unsupported shape is never accepted for pruning
    assert(!GhArchiveSource.accepts(
      StringContains("line", "PushEvent")))
  }

  test("x79 entropy: permutation-invariant exactly; replication-invariant within rounding") {
    import graft.plans.CharEntropyMicro.entropyMicro
    val rng = new scala.util.Random(79)
    val strGen = Gen.listOfN(200,
      Gen.frequency(8 -> Gen.alphaChar, 2 -> Gen.oneOf(' ', '.', 'é', '中')))
      .map(_.mkString)
    (1 to 50).foreach { _ =>
      val s = strGen.sample.get
      // sorted-run counting makes character ORDER irrelevant — exact
      val shuffled = new String(rng.shuffle(s.toSeq).toArray)
      assert(entropyMicro(s) === entropyMicro(shuffled))
      // H(s repeated k) = H(s) mathematically; integer per-term
      // rounding moves the micro value by at most a few units
      val rep = s * 3
      assert(math.abs(entropyMicro(rep) - entropyMicro(s)) <= 3L,
        s"replication drift on '$s'")
      // bounds: 0 ≤ H ≤ ln(n) (all-distinct maximum), in micro-nats
      val e = entropyMicro(s)
      assert(e >= -1L && e <= math.round(math.log(s.length) * 1e6) + 1L)
    }
  }
}
