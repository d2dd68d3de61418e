package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins TrainingDataDemo's claim that its stages are the oracle-audited
  * operators (x14 gates, x17 clusters, x24 decontamination, x23 split):
  * the reported stage counts must RECONCILE numerically against those
  * operators' own outputs, not merely shrink monotonically (LayoutSpec
  * checks the structural side). */
class DemoSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("demo stage counts reconcile against x14/x39/x17/x24/x23") {
    val (corpus, report) = TrainingDataDemo.run(spark, sf, None)
    val counts = report.toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text")

    assert(counts("raw_documents") === docs.count())

    // x14 — the gate battery: pre-dedup kept rows equal the audit's
    // per-source n_kept total, and the demo's gated+deduped stage
    // equals the distinct kept fingerprints
    val cur = graft.streaming.DocCuration.curated(docs)
      .localCheckpoint(false)
    val x14KeptTotal = operators.TextOps.curationPipeline(spark, sf)
      .agg(sum($"n_kept")).as[Long].head()
    assert(cur.count() === x14KeptTotal)
    assert(counts("after_gates_and_exact_dedup") ===
      cur.select($"fp").distinct().count())

    // x39 — classifier gate: the stage equals the gate survivors whose
    // classifier score is nonnegative, per the audited query itself
    val kept = operators.TextOps.qualityClassifier(spark, sf)
      .filter($"keep").select($"doc_id")
    val classed = graft.streaming.DocCuration.curateBatch(docs)
      .select($"doc_id").join(kept, "doc_id")
    assert(counts("after_classifier_gate") === classed.count())

    // x51 — repetition gate: the stage equals the classifier survivors
    // the audited repetition query itself leaves unflagged
    val unflagged = operators.DedupOps.gopherRepetition(spark, sf)
      .filter(!$"flagged").select($"doc_id")
    val unrep = classed.join(unflagged, "doc_id")
    assert(counts("after_repetition_gate") === unrep.count())
    assert(unrep.count() < classed.count(),
      "the repetition gate should drop some fixture docs")

    // x48 — DSIR selection: the stage equals the classifier survivors
    // whose per-token importance (from the audited query itself) sits
    // above the corpus mean Σscore6/Σtoks — the demo's relative cut,
    // recomputed here driver-side in exact BigInt cross-multiplication
    // (the same integer comparison the demo evaluates in bounded
    // decimals, so the reconciliation is bit-exact, not fp-noise-deep)
    val ptScores = operators.TextOps.dsirWeights(spark, sf)
      .select($"doc_id", $"score6", $"n_toks")
      .as[(Long, Long, Long)].collect()
    val ts = ptScores.map(r => BigInt(r._2)).sum
    val tt = ptScores.map(r => BigInt(r._3)).sum
    val selIds = ptScores
      .filter(r => BigInt(r._2) * tt > ts * BigInt(r._3)).map(_._1).toSet
    val gated = unrep.filter($"doc_id".isInCollection(selIds))
    assert(counts("after_dsir_selection") === gated.count())

    // x17 — near-dup clustering: the demo keeps exactly one survivor
    // per cluster that has at least one classifier-surviving member
    val labels = operators.DedupOps.dedupClusters(spark, sf)
    val nSurvivingClusters = labels.join(gated, "doc_id")
      .select($"rep").distinct().count()
    assert(counts("after_near_dup_clustering") === nSurvivingClusters)

    // x24 — decontamination: the drop equals exactly the implicated
    // survivors, no more, no fewer. The survivor set mirrors the
    // demo's x77 canonical policy (max quality, min doc_id) recomputed
    // driver-side from the audited quality scores.
    val qm = operators.TextOps.scoredDocs(spark, sf)
      .select($"doc_id", $"q_micro").as[(Long, Long)].collect().toMap
    val survivorIds = gated.join(labels, "doc_id")
      .select($"doc_id", $"rep").as[(Long, Long)].collect()
      .groupBy(_._2).values
      .map(ms => ms.map(_._1).minBy(id => (-qm(id), id))).toSet
    val survivors = gated.sparkSession
      .createDataset(survivorIds.toSeq).toDF("doc_id")
    val dirty = operators.DedupOps.contaminationEval(spark, sf)
      .select($"train_id".as("doc_id")).distinct()
    val removed = survivors.join(dirty, "doc_id").count()
    assert(counts("after_decontamination") ===
      counts("after_near_dup_clustering") - removed)

    // x23 — deterministic split: the final corpus is a SUBSET of the
    // corpus x23 labels, so every (source, split) cell is bounded by
    // the audit's cell, and the totals agree with the final stage
    val demoCells = corpus.groupBy($"source", $"split")
      .agg(count("*").as("n"))
      .as[(String, String, Long)].collect()
      .map { case (src, sp, n) => (src, sp) -> n }.toMap
    val x23Cells = operators.TextOps.splitAssign(spark, sf)
      .as[(String, String, Long)].collect()
      .map { case (src, sp, n) => (src, sp) -> n }.toMap
    demoCells.foreach { case (cell, n) =>
      assert(n <= x23Cells(cell), s"demo cell $cell exceeds the x23 audit")
    }
    assert(demoCells.values.sum === counts("after_decontamination"))

    // x43 — residual substring duplication: the reported budget equals
    // the span operator run directly on the returned corpus's train
    // split (exact reconciliation, not a bound)
    val trainDocs = corpus.filter($"split" === "train")
      .select($"doc_id", $"text")
    val resid = operators.DedupOps.substringSpansOf(trainDocs)
      .agg(coalesce(sum($"e" - $"s" + 1), lit(0L)).cast("long"))
      .as[Long].head()
    assert(counts("train_dup_span_tokens") === resid)

    // x36 — mixture budget: the plan runs on the demo's OWN train
    // corpus, so reconcile structurally: the budget is half that
    // corpus's tokens (within per-source rounding slack), and the
    // sampled stage is a subset of train that each capped source
    // thinned
    val train = corpus.filter($"split" === "train")
    val trainTokens = train
      .select(size(split(trim($"text"), "\\s+")).cast("long"))
      .as[Long].collect().sum
    val k = train.select($"source").distinct().count()
    val budget = trainTokens / operators.TextOps.MixtureBudgetDen
    assert(counts("mixture_budget_tokens") <= budget)
    assert(counts("mixture_budget_tokens") >= budget - k)
    assert(counts("train_after_mixture_budget") <= train.count())
    assert(counts("train_after_mixture_budget") > 0L)

    // x53 — training order: the shard count is what the audited
    // permutation assigns over any corpus of that size (≤ NumShards,
    // > 1 whenever more than a handful of docs survive)
    assert(counts("train_order_shards") <= operators.TextOps.NumShards)
    assert(counts("train_order_shards") > 1L,
      "the surviving train corpus should spread across shards")

    // x70 — per-source flooring audit: the reported count recomputes
    // from the gate output and a driver-side global p75 over the x08
    // micro scores
    val q = operators.TextOps.textQuality(spark, sf)
      .select($"doc_id", round($"quality" * 1e6, 0).cast("long"))
      .as[(Long, Long)].collect().toMap
    val sortedQ = q.values.toSeq.sorted
    val pos = 0.75 * (sortedQ.size - 1)
    val (lo, hi) = (sortedQ(pos.toInt), sortedQ(math.ceil(pos).toInt))
    val gth = lo + (pos - pos.toInt) * (hi - lo)
    val saved = operators.TextOps.qualityGate(spark, sf)
      .select($"doc_id").as[Long].collect()
      .count(id => q(id) < gth)
    assert(counts("saved_by_per_source_quality_gate") === saved.toLong)

    // x79 — entropy-tail audit: the reported count recomputes from
    // the operator's flags intersected with the returned train split
    val trainIds = corpus.filter($"split" === "train")
      .select($"doc_id").as[Long].collect().toSet
    val flagged = operators.TextOps.charEntropy(spark, sf)
      .filter($"low_entropy" || $"high_entropy")
      .select($"doc_id").as[Long].collect()
      .count(trainIds)
    assert(counts("train_in_entropy_tails") === flagged.toLong)

    // x73 — overlap panel: the reported max Jaccard is the operator's
    assert(counts("max_source_jaccard_ppm") ===
      operators.DedupOps.sourceSimilarity(spark, sf)
        .agg(coalesce(max(round($"jaccard" * 1e6, 0).cast("long")), lit(0L)))
        .as[Long].head())

    // x61b — diversity-slate certificate: the reported coverage ppm is
    // the sampled twin's own one-scan corpus-radius certificate,
    // bit-stable (deterministic A-Res draw + round-4 cosine)
    assert(counts("kcenter_slate_coverage_ppm") ===
      operators.SimilarityOps.kcenterCoresetSampled(spark, sf)
        .agg(max(round($"coverage" * 1e6, 0).cast("long")))
        .as[Long].head())

    // x76 — leak audit: every counted doc is a member of a
    // multi-member cluster (singletons agree with x23 by definition)
    val cs = operators.DedupOps.clusterSplit(spark, sf)
      .as[(Long, Long, String)].collect()
    val multiDocs = cs.groupBy(_._2).filter(_._2.size > 1)
      .values.flatten.map(_._1).toSet
    val corpusSplits = corpus.select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    val movedRef = cs.count { case (id, _, csp) =>
      corpusSplits.get(id).exists(_ != csp) }
    assert(counts("leaks_prevented_by_cluster_split") === movedRef.toLong)
    cs.filter { case (id, _, csp) =>
      corpusSplits.get(id).exists(_ != csp) }
      .foreach { case (id, _, _) =>
        assert(multiDocs(id), s"moved doc $id is not in a real cluster") }
  }
}
