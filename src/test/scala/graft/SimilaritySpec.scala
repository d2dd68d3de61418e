package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{CoreQueries, SimilarityOps}

/** ANN operators vs the exact brute-force baseline. The LSH/IVF searches
  * are deterministic (seeded planes, fixed centroid sample), so these
  * are stable equality/containment checks, not statistical ones. */
class SimilaritySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  /** Exact cosine of every candidate vs vec 0 — ground truth ranking. */
  private lazy val exactAll: Map[Long, Double] = {
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val q = emb.filter($"vec_id" === 0).select($"e".as("qe"))
    emb.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id",
        round(CoreQueries.cosineSimHof($"e", $"qe"), 4).as("sim"))
      .as[(Long, Double)].collect().toMap
  }

  test("exact knn (Q16) is the true top-5 of the full ranking") {
    val top = CoreQueries.knnCosine(spark, sf)
      .as[(Long, Double)].collect()
    val trueTop = exactAll.toSeq.sortBy { case (id, s) => (-s, id) }.take(5)
    assert(top.toSeq === trueTop)
  }

  test("ann_lsh returns K rows whose sims are true cosines, sorted") {
    val got = SimilarityOps.annLsh(spark, sf).as[(Long, Double)].collect()
    assert(got.length === SimilarityOps.TopK)
    got.foreach { case (id, s) => assert(exactAll(id) === s) }
    assert(got.map(-_._2).toSeq === got.map(-_._2).toSeq.sorted)
  }

  test("ann_ivf returns K rows whose sims are true cosines, sorted") {
    val got = SimilarityOps.annIvf(spark, sf).as[(Long, Double)].collect()
    assert(got.length === SimilarityOps.TopK)
    got.foreach { case (id, s) => assert(exactAll(id) === s) }
    assert(got.map(-_._2).toSeq === got.map(-_._2).toSeq.sorted)
  }

  test("index-served annLsh equals the in-memory multiprobe filter") {
    // same candidate rule, two execution shapes: the bucket-partitioned
    // index equi-join (serving path) must return exactly what the
    // bit-count filter over in-plan signatures returns
    val served = SimilarityOps.annLsh(spark, sf)
      .as[(Long, Double)].collect().toSeq
    val inMem = SimilarityOps.annLshFrame(spark,
      Tables.embeddings(spark, sf)
        .select($"vec_id", $"embedding".cast("array<double>").as("e")))
      .as[(Long, Double)].collect().toSeq
    assert(served === inMem)
  }

  test("index-served annIvf equals the in-memory train+serve plan") {
    // training is exact integer arithmetic, so the persisted index and
    // the one-plan form must serve identical neighbors
    val served = SimilarityOps.annIvf(spark, sf)
      .as[(Long, Double)].collect().toSeq
    val inMem = SimilarityOps.annIvfInMemory(spark, sf)
      .as[(Long, Double)].collect().toSeq
    assert(served === inMem)
  }

  test("x38 IVF-PQ: reported sims are true cosines; recall holds") {
    val rows = SimilarityOps.annIvfPq(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.length === SimilarityOps.TopK)
    // the rerank is honest: emitted sims are TRUE cosines of the full
    // vectors, ordered; ADC distances are nonnegative integers
    rows.foreach { case (id, adc, s) =>
      assert(exactAll(id) === s); assert(adc >= 0L) }
    assert(rows.map(-_._3).toSeq === rows.map(-_._3).toSeq.sorted)
    // recall vs the EXACT ranking: this fixture is adversarially
    // neighbor-free random data (max cos ≈ 0.37), yet 4-bit PQ must
    // still land most of the true top-K (observed 3/5 at sf0.001 and
    // sf0.01; ≥ 2 is the conservative floor). Also vs x12 — the exact
    // ranking RESTRICTED to the probed lists — which isolates PQ
    // quantization error from IVF probing error.
    val exactTop = exactAll.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(SimilarityOps.TopK).map(_._1).toSet
    assert(rows.map(_._1).toSet.intersect(exactTop).size >= 2,
      s"PQ recall vs exact top-K too low: ${rows.map(_._1).toSeq}")
    val probedExact = SimilarityOps.annIvf(spark, sf)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(rows.map(_._1).toSet.intersect(probedExact).size >= 2,
      "PQ recall vs exact-over-probed-lists too low")
  }

  test("ann searches are deterministic across invocations") {
    val a = SimilarityOps.annLsh(spark, sf).as[(Long, Double)].collect().toSeq
    val b = SimilarityOps.annLsh(spark, sf).as[(Long, Double)].collect().toSeq
    assert(a === b)
  }

  test("knn join: every query answered; sims are true cosines") {
    val rows = SimilarityOps.knnJoin(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    // the answered-query set must equal the set DERIVED FROM THE
    // FIXTURE: queries with at least one other vector in a probed
    // bucket (hamming ≤ ProbeRadius). That is an invariant of the
    // operator — asserting "all 20 answered" outright would be a
    // property of this particular random fixture (a regenerated corpus
    // can leave a query's probed buckets empty), and a broken bucket
    // join that drops queries still fails this form.
    val buckets = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .withColumn("b", SimilarityOps.lshSignature(spark, $"e"))
      .select($"vec_id", $"b").as[(Long, Long)].collect()
    val expectAnswered = buckets
      .filter(_._1 < SimilarityOps.KnnJoinQueries)
      .filter { case (q, qb) => buckets.exists { case (c, cb) =>
        c != q && java.lang.Long.bitCount(qb ^ cb) <= SimilarityOps.ProbeRadius } }
      .map(_._1).toSet
    assert(rows.map(_._1).toSet === expectAnswered)
    // ground truth: exact cosine recomputed driver-side
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.foreach { case (qid, _, cid, sim) =>
      assert(qid < SimilarityOps.KnnJoinQueries && cid != qid)
      val want = BigDecimal(cos(emb(qid), emb(cid)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(sim === want, s"cosine mismatch for ($qid, $cid)")
    }
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.length <= SimilarityOps.KnnJoinK)
      val sims = sorted.map(_._4).toSeq
      assert(sims === sims.sorted.reverse)
    }
  }

  test("LSH recall on PLANTED near-neighbors (cos ≥ 0.9) is high") {
    // the driver fixture's embeddings are random (max cos ≈ 0.37 — no
    // true neighbors to find); this corpus plants 5 genuine near-dups
    // of the probe, the case the index exists for
    val rng = new scala.util.Random(23)
    val dim = SimilarityOps.Dim
    val probe = Array.fill(dim)(rng.nextGaussian())
    def noisy(scale: Double): Seq[Double] =
      probe.map(x => x + rng.nextGaussian() * scale).toSeq
    val planted = (1L to 5L).map(i => (i, noisy(0.12)))   // cos ≈ 0.97
    val fillers = (6L to 300L).map(i =>
      (i, Seq.fill(dim)(rng.nextGaussian())))
    val emb = ((0L, probe.toSeq) +: (planted ++ fillers))
      .toDF("vec_id", "e")
    val got = SimilarityOps.annLshFrame(spark, emb)
      .select($"vec_id").as[Long].collect().toSet
    val recall = got.count(_ <= 5L)
    assert(recall >= 4, s"planted-neighbor recall $recall/5 too low")
  }

  test("x50 random projection matches a driver recompute; JL norm concentration holds") {
    val got = SimilarityOps.randomProjection(spark, sf)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3).toSeq
      }
    val embs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    assert(got.size === embs.length)
    val ratios = embs.map { case (id, e) =>
      val want = SimilarityOps.rpSigns.map { row =>
        BigDecimal(e.zip(row).foldLeft(0.0) { case (a, (x, s)) => a + x * s })
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(got(id) === want, s"projection of vec $id")
      // E[‖y‖²] = RpK·‖x‖² under ±1 signs — per-vector concentration
      val ny = want.map(v => v * v).sum / SimilarityOps.RpK
      val nx = e.map(v => v * v).sum
      ny / nx
    }
    ratios.foreach(r => assert(r > 0.2 && r < 5.0, s"norm ratio $r"))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.25, s"mean norm ratio $mean")
  }

  test("x50 composes with ANN: planted near-neighbors survive the projection") {
    // same planted corpus as the LSH recall test: true neighbors at
    // cos ≈ 0.97 must still rank top in the 16-dim projected space —
    // the property that makes projected-space search usable at all
    val rng = new scala.util.Random(29)
    val dim = SimilarityOps.Dim
    val probe = Array.fill(dim)(rng.nextGaussian())
    def noisy(scale: Double): Seq[Double] =
      probe.map(x => x + rng.nextGaussian() * scale).toSeq
    val planted = (1L to 5L).map(i => (i, noisy(0.12)))
    val fillers = (6L to 300L).map(i =>
      (i, Seq.fill(dim)(rng.nextGaussian())))
    val emb = ((0L, probe.toSeq) +: (planted ++ fillers)).toDF("vec_id", "e")
    val proj = SimilarityOps.projectFrame(emb)
    val q = proj.filter($"vec_id" === 0).select($"y".as("qy"))
    val top = proj.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id", CoreQueries.cosineSimHof($"y", $"qy").as("sim"))
      .orderBy($"sim".desc, $"vec_id").limit(5)
      .select($"vec_id").as[Long].collect()
    val recall = top.count(_ <= 5L)
    assert(recall >= 4, s"projected-space recall $recall/5 too low")
  }

  test("x60 mmr slate replays the greedy from the HOF reference cosine") {
    // independent replay: fresh-max formulation (recompute max-sim to
    // the whole slate each step) from cosineSimHof — cross-validates
    // both the production CosineFn and the incremental-max shortcut
    val got = SimilarityOps.mmrDiversity(spark, sf)
      .as[(Long, Long, Double, Double)].collect().toSeq
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val q = emb.filter($"vec_id" === 0).select($"e".as("qe"))
    val pool = emb.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id", $"e",
        round(CoreQueries.cosineSimHof($"e", $"qe"), 4).as("rel"))
      .as[(Long, Seq[Double], Double)].collect()
      .sortBy { case (id, _, r) => (-r, id) }.take(SimilarityOps.MmrPoolM)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      val na = a.foldLeft(0.0)((acc, x) => acc + x * x)
      val nb = b.foldLeft(0.0)((acc, x) => acc + x * x)
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    var sel = Vector.empty[(Long, Seq[Double], Double, Double)]
    var rem = pool.toVector
    for (_ <- 1 to SimilarityOps.MmrK) {
      val pick =
        if (sel.isEmpty) { val (i, e, r) = rem.head; (i, e, r, r) }
        else rem.map { case (i, e, r) =>
          (i, e, r, r - sel.map(s => cos(e, s._2)).max)
        }.minBy { case (i, _, _, sc) => (-sc, i) }
      sel :+= pick
      rem = rem.filterNot(_._1 == pick._1)
    }
    val want = sel.zipWithIndex.map { case ((i, _, r, sc), k) =>
      (k + 1L, i, r, sc)
    }
    assert(got === want)
    // structure: rank 1 is the plain-relevance argmax; later scores
    // can only shrink (each candidate's max-sim grows with the slate)
    assert(got.head._2 === pool.head._1)
    got.drop(1).sliding(2).foreach { case Seq(a, b) =>
      assert(b._4 <= a._4, s"score rose from $a to $b")
    }
  }

  test("x61 k-center slate replays farthest-first from the HOF cosine") {
    val got = SimilarityOps.kcenterCoreset(spark, sf)
      .as[(Long, Long, Option[Double])].collect().toSeq
    val all = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      BigDecimal(dot / (math.sqrt(a.map(x => x * x).sum) *
          math.sqrt(b.map(x => x * x).sum)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // fresh-max replay (recompute every candidate's max-sim to the
    // whole slate each step) — cross-validates the incremental state
    val byId = all.toMap
    var sel = Vector(0L)
    var want = Vector[(Long, Long, Option[Double])]((1L, 0L, None))
    for (rank <- 2 to SimilarityOps.KCenterK) {
      val (id, ms) = all.filterNot { case (i, _) => sel.contains(i) }
        .map { case (i, e) => (i, sel.map(c => cos(e, byId(c))).max) }
        .minBy { case (i, m) => (m, i) }
      want :+= ((rank.toLong, id, Some(1.0 - ms)))
      sel :+= id
    }
    assert(got === want)
    // coverage-radius certificate: the pick distances never increase
    got.drop(1).map(_._3.get).sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"radius rose $a -> $b")
    }
    // after all picks, every vector sits within the final radius of a
    // center (the 2-approx guarantee's witness on this fixture)
    val radius = got.last._3.get
    val centers = got.map(_._2).toSet
    all.filterNot { case (i, _) => centers.contains(i) }.foreach {
      case (i, e) =>
        val d = 1.0 - centers.map(c => cos(e, byId(c))).max
        assert(d <= radius + 1e-12, s"vec $i at $d outside radius $radius")
    }
  }

  test("x65 bitext margins replay from Spark buckets + driver cosines") {
    // replay the whole pipeline in plain Scala: the candidate rule from
    // the operator's own LSH buckets, left-to-right fold cosines, the
    // 1e4-scaled integer neighborhood sums, and the ratio margin — the
    // operator's top-M rows must match exactly, order included
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      def dot(x: Seq[Double], y: Seq[Double]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val rows = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label",
        $"embedding".cast("array<double>").as("e"))
      .withColumn("bucket",
        SimilarityOps.lshSignature(spark, $"e").cast("long"))
      .as[(Long, Int, Seq[Double], Long)].collect()
    val aSide = rows.filter(_._2 % 2 == 0)
    val bSide = rows.filter(_._2 % 2 == 1)
    val cands = for {
      (aid, _, ae, ab) <- aSide
      (bid, _, be, bb) <- bSide
      if java.lang.Long.bitCount(ab ^ bb) <= SimilarityOps.ProbeRadius
    } yield (aid, bid, r(cos(ae, be), 4))
    def topk(xs: Seq[(Long, Long, Double)], key: ((Long, Long, Double)) => Long,
             tie: ((Long, Long, Double)) => Long) =
      xs.groupBy(key).map { case (k, g) =>
        k -> g.sortBy(t => (-t._3, tie(t))).take(SimilarityOps.BitextK) }
    def s4(x: Double) =
      BigDecimal(x * 1e4).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val fk = topk(cands.toSeq, _._1, _._2)
    val bk = topk(cands.toSeq, _._2, _._1)
    val avgA = fk.map { case (k, g) => k -> ((g.map(t => s4(t._3)).sum, g.size)) }
    val avgB = bk.map { case (k, g) => k -> ((g.map(t => s4(t._3)).sum, g.size)) }
    val want = fk.values.flatten.toSeq.map { case (aid, bid, sim) =>
      val (sa, na) = avgA(aid); val (sb, nb) = avgB(bid)
      (aid, bid, sim,
        r(sim / (sa / (2.0 * na * 1e4) + sb / (2.0 * nb * 1e4)), 6))
    }.sortBy { case (a, b, _, m) => (-m, a, b) }.take(SimilarityOps.BitextTopM)
    val got = SimilarityOps.bitextMining(spark, sf)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
    // hubness normalization does real work on this fixture: the margin
    // order must not simply be the cosine order
    assert(got.map(_._3) !== got.map(_._3).sorted.reverse)
  }

  test("x69 hard negatives: under the dup cap, dense ranks, disjoint from x05 positives") {
    val got = SimilarityOps.hardNegatives(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    // strictly below the near-dup threshold — nothing the dedup
    // pipeline would merge may appear as a negative
    assert(got.forall(_._4 < SimilarityOps.HardNegCap))
    assert(got.forall(r => r._3 != r._1), "anchor never its own negative")
    // ranks dense from 1, ordered by sim desc within each anchor
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) === (1L to sorted.size).toSeq, s"anchor $qid")
      assert(sorted.map(-_._4) === sorted.map(-_._4).sorted, s"anchor $qid order")
    }
    // cross-consistency with x05: a mined negative is never a near-dup
    // PAIR of its anchor under the corpus rule
    val dups = graft.operators.DedupOps.dedupEmbedding(spark, sf)
      .as[(Long, Long, Double)].collect()
      .flatMap { case (a, b, _) => Seq((a, b), (b, a)) }.toSet
    assert(got.forall(r => !dups.contains((r._1, r._3))))
  }

  test("x72 triplets: positives are exactly the x05 verdicts, margins positive") {
    val got = SimilarityOps.contrastiveTriplets(spark, sf)
      .as[(Long, Long, Double, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty, "fixture near-dup pairs must yield triplets")
    val pairs = graft.operators.DedupOps.dedupEmbedding(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    val posSet = pairs.flatMap { case (a, b, s) => Seq((a, b, s), (b, a, s)) }.toSet
    // every (anchor, positive, sim_pos) is an x05 verdict, oriented
    assert(got.forall { case (a, p, sp, _, _, _) => posSet((a, p, sp)) })
    // the triplet margin is structurally positive: positives sit at or
    // above the near-dup threshold, negatives strictly below it
    assert(got.forall { case (_, _, sp, _, _, sn) => sp > sn })
    got.foreach { case (a, p, _, _, n, _) =>
      assert(n != a && n != p, s"negative $n collides with anchor/positive")
    }
    // ranks dense per (anchor, positive) leg
    got.groupBy(t => (t._1, t._2)).foreach { case (k, rows) =>
      assert(rows.map(_._4).sorted === (1L to rows.size).toSeq, s"$k ranks")
    }
  }

  test("x72 broadcast→shuffle fallback: threshold conf flips the plan, not the rows") {
    // the scale escape hatch the operator's Scaladoc promises: on a
    // dup-heavy corpus whose positive relation outgrows broadcast
    // range, disabling auto-broadcast shuffles the final join on qid.
    // Prove the switch is real (the hint is actually dropped) and
    // harmless (bitwise-equal triplets, no nested-loop/cartesian).
    val default = SimilarityOps.contrastiveTriplets(spark, sf)
      .as[(Long, Long, Double, Long, Long, Double)].collect().toSeq
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SimilarityOps.contrastiveTriplets(spark, sf)
      val fell = df.as[(Long, Long, Double, Long, Long, Double)]
        .collect().toSeq
      assert(fell === default)
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // no unbounded plan shapes appear (the hinted broadcast-NL cross
      // of the tiny centroid table inside the IVF probe is pinned fine
      // by the x12/x69 audits and remains)
      assert(!p.contains("CartesianProduct"))
      // the final pos⋈negs join really shuffled instead of broadcasting
      assert("(SortMergeJoin|ShuffledHashJoin) \\[qid".r.findFirstIn(p).isDefined,
        "with the threshold disabled the qid join must shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("x69/x72 measured broadcast pin: over-cap counts flip hints to keyed shuffles, not rows") {
    // the r16 rule: no hope-bounded broadcasts — every anchor- and
    // candidate-proportional hint in the mining chain is pinned only
    // under a MEASURED count cap. Forcing both caps to 0 simulates a
    // corpus whose dup-pair relation outgrew broadcast range: the
    // chain must shuffle on its keys AUTOMATICALLY (no global conf
    // flip) and produce bitwise-identical rows.
    val defaults = Seq("x69_hard_negatives", "x72_contrastive_triplets")
      .map { q =>
        q -> SparkEntry.queries(q)(spark, sf).collect().map(_.toSeq).toSeq
      }.toMap
    spark.conf.set("spark.graft.negBroadcastMaxAnchors", "0")
    spark.conf.set("spark.graft.negBroadcastMaxCandidates", "0")
    try {
      defaults.foreach { case (q, want) =>
        val df = SparkEntry.queries(q)(spark, sf)
        assert(df.collect().map(_.toSeq).toSeq === want,
          s"$q must be bitwise-stable when the measured caps force the shuffle branch")
        val p = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        assert(!p.contains("CartesianProduct"),
          s"$q must not degrade to a cartesian over the caps")
      }
      // the x72 final pos⋈negs join really shuffled on qid
      val p72 = SparkEntry.queries("x72_contrastive_triplets")(spark, sf)
        .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert("(SortMergeJoin|ShuffledHashJoin) \\[qid".r
        .findFirstIn(p72).isDefined,
        "over the anchor cap the qid join must shuffle, not broadcast")
    } finally {
      spark.conf.unset("spark.graft.negBroadcastMaxAnchors")
      spark.conf.unset("spark.graft.negBroadcastMaxCandidates")
    }
  }

  test("x69/x22/x06 broadcast→shuffle fallback: conf flips plans, not rows") {
    // the same escape-hatch discipline extended to the probe family:
    // every growing broadcast in the x69 mining core is gated on the
    // standard threshold conf, and the x22/x06 bucket joins survive
    // the flip — bitwise-equal output, no cartesian anywhere
    val queries = Seq("x69_hard_negatives", "x22_knn_join", "x06_ann_lsh")
    val defaults = queries.map { q =>
      q -> SparkEntry.queries(q)(spark, sf).collect().map(_.toSeq).toSeq
    }.toMap
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      queries.foreach { q =>
        val df = SparkEntry.queries(q)(spark, sf)
        assert(df.collect().map(_.toSeq).toSeq === defaults(q),
          s"$q must be bitwise-stable under the conf flip")
        val p = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        assert(!p.contains("CartesianProduct"),
          s"$q must not degrade to a cartesian under the conf flip")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("IVF family serves a corpus whose vec_ids exceed Int.MaxValue") {
    // cid is a seed vec_id, so it inherits the key's 64-bit magnitude:
    // the 25× sweep's key-shifted corpus put seed ids past 2^31 and the
    // old `cid.cast("int")` in the assign/codes writes threw
    // CAST_OVERFLOW under ANSI. This corpus plants seeds directly above
    // Int.MaxValue (multiples of CentroidStep) plus the small
    // PqSeedStep codebook seeds, and requires both ANN servers to
    // build, probe, and rank — with partition pruning still in the
    // plan now that the partition column reads back as BIGINT.
    val rng = new scala.util.Random(41)
    val dim = SimilarityOps.Dim
    def vec(): Seq[Float] = Seq.fill(dim)(rng.nextGaussian().toFloat)
    val step = SimilarityOps.CentroidStep.toLong
    val bigSeeds = (0 until 4).map(j => (25_000_000L + j) * step) // > 2^31
    val members = bigSeeds.flatMap(s => (1L to 6L).map(s + _))
      .filter(_ % step != 0)
    val pqSeeds = (1 to 10).map(_ * SimilarityOps.PqSeedStep.toLong)
    val ids = (0L +: (bigSeeds ++ members ++ pqSeeds)).distinct
    assert(bigSeeds.forall(_ > Int.MaxValue.toLong))
    val dir = java.nio.file.Files.createTempDirectory("graft-bigid-").toString
    ids.map(i => (i, vec(), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")

    for ((name, df) <- Seq("x12" -> SimilarityOps.annIvf(spark, dir),
                           "x38" -> SimilarityOps.annIvfPq(spark, dir))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"$name must keep partition pruning with BIGINT cids")
      val got = df.select($"vec_id").as[Long].collect()
      assert(got.length === SimilarityOps.TopK, s"$name row count")
      assert(got.forall(id => ids.contains(id) && id != 0L), s"$name ids")
      assert(got.exists(_ > Int.MaxValue.toLong),
        s"$name must be able to return past-2^31 ids")
    }
  }
}
