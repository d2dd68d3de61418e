package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Brute-force cosine top-K is CoreQueries.knnCosine (Q16) — the exact
  * baseline. This module adds the scale path:
  *
  *  - Random-hyperplane LSH: 8 signed projections → 8-bit bucket key.
  *    Probing the query's bucket plus all buckets within hamming-2
  *    bounds the scanned fraction to ~37/256 ≈ 14% of the corpus (at
  *    uniform load) — at 100 TB the bucket key is the shuffle/partition
  *    key and no full scan happens.
  *  - IVF (inverted file): coarse quantizer = deterministic sample of
  *    vectors as centroids; vectors assigned to nearest centroid;
  *    queries probe the nProbe nearest centroid lists.
  *
  * Both are deterministic (seeded hyperplanes / fixed sample) so results
  * are reproducible run to run; accuracy is asserted against the exact
  * baseline in SimilaritySpec rather than a SQL oracle.
  *
  * Literature: random-hyperplane signatures are Charikar's rounding
  * scheme (STOC 2002); the inverted-file coarse quantizer follows the
  * IVF stage of Jégou–Douze–Schmid (PAMI 2011).
  */
object SimilarityOps {

  val Dim: Int = graft.plans.HyperplaneSignature.Dim
  val NumPlanes: Int = graft.plans.HyperplaneSignature.NumPlanes
  val ProbeRadius = 2   // scan buckets within hamming-2 of the probe's
  val TopK = 5

  /** Signed-projection signature: bit i = [v · plane_i > 0], computed by
    * the fused codegen HyperplaneSignature expression (seeded planes). */
  def lshSignature(s: SparkSession, v: Column): Column = {
    graft.plans.GraftExpressions.register(s)
    call_function(graft.plans.GraftExpressions.HyperplaneFn, v)
  }

  /** ANN top-K for one probe vector (vec_id 0): scan only the probe's
    * LSH bucket and its hamming-1 neighbor buckets, then exact cosine
    * on the survivors. */
  def annLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .withColumn("bucket", lshSignature(s, $"e"))
    val probe = emb.filter($"vec_id" === 0)
      .select($"e".as("qe"), $"bucket".as("qb"))
    // multiprobe: hamming(bucket, query bucket) ≤ ProbeRadius — with 8
    // planes this scans ~37/256 ≈ 14% of buckets. (In a real index the
    // probed bucket keys join against a bucket-partitioned table; the
    // bit-trick filter here has identical candidate-set semantics.)
    emb.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(probe))
      .filter(bit_count($"bucket".bitwiseXOR($"qb")) <= ProbeRadius)
      .select($"vec_id", round(CoreQueries.cosine(s, $"e", $"qe"), 4).as("sim"))
      .orderBy($"sim".desc, $"vec_id")
      .limit(TopK)
  }

  val CentroidStep = 97   // vec_id ≡ 0 (mod 97) → ~n/97 seeds, ∝ corpus
  val KmeansIters = 2
  val NProbe = 4

  /** Nearest-centroid assignment: argmax cosine over broadcast
    * centroids, taken with a struct-max AGGREGATE (ordering fields
    * csim DESC then cid ASC via negation, payload carried behind them).
    * Unlike a row_number window — which would shuffle the whole
    * corpus×centroids cross product — the aggregate combines map-side,
    * so only one row per vector reaches the exchange. */
  private def assign(s: SparkSession, emb: DataFrame,
                     cents: DataFrame): DataFrame = {
    import s.implicits._
    emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"e", $"cid",
        CoreQueries.cosine(s, $"e", $"ce").as("csim"))
      .groupBy($"vec_id")
      .agg(max(struct($"csim", (-$"cid").as("negCid"), $"cid", $"e")).as("m"))
      .select($"vec_id", $"m.e".as("e"), $"m.cid".as("cid"))
  }

  /** Trained coarse quantizer: modulo-sampled seeds refined with
    * Lloyd's iterations. The elementwise centroid mean goes through
    * posexplode → per-(centroid, dimension) mean → rebuild, which is
    * the shuffle-bounded way to average vectors at corpus scale (never
    * a per-group collect of all members). The mean is computed over
    * e9-quantized INTEGER coordinates — an exact, order-insensitive
    * sum — so training (and therefore the whole index) is
    * deterministic run to run, not subject to fp merge order. */
  def kmeansCentroids(s: SparkSession, emb: DataFrame,
                      iters: Int): DataFrame = {
    import s.implicits._
    var cents = emb.filter($"vec_id" % CentroidStep === 0)
      .select($"vec_id".as("cid"), $"e".as("ce"))
    var i = 0
    while (i < iters) {
      val dims = assign(s, emb, cents)
        .select($"cid", posexplode($"e"))
        .groupBy($"cid", $"pos")
        .agg((sum(round($"col" * 1e9).cast("long")) / 1e9 / count("*")).as("v"))
      cents = dims
        .groupBy($"cid")
        .agg(array_sort(collect_list(struct($"pos", $"v"))).as("pv"))
        .select($"cid", expr("transform(pv, x -> x.v)").as("ce"))
      i += 1
    }
    cents
  }

  /** IVF: vectors assigned to their nearest trained centroid; a query
    * probes only the NProbe nearest centroid lists. The trained
    * centroid table (tiny: ~n/97 rows) is materialized once with
    * localCheckpoint — it is referenced from several subplans, and the
    * non-broadcast references would otherwise re-run the whole training
    * chain per reference. */
  def annIvf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val cents = kmeansCentroids(s, emb, KmeansIters).localCheckpoint(true)
    val assigned = assign(s, emb, cents)
    val probe = assigned.filter($"vec_id" === 0).select($"e".as("qe"))
    // centroid lists to probe for the query
    val probeCids = cents.crossJoin(broadcast(probe))
      .select($"cid", CoreQueries.cosine(s, $"ce", $"qe").as("csim"))
      .orderBy($"csim".desc, $"cid").limit(NProbe)
      .select($"cid")
    assigned.filter($"vec_id" =!= 0)
      .join(broadcast(probeCids), "cid")
      .crossJoin(broadcast(probe))
      .select($"vec_id", round(CoreQueries.cosine(s, $"e", $"qe"), 4).as("sim"))
      .orderBy($"sim".desc, $"vec_id")
      .limit(TopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x06_ann_lsh" -> annLsh _,
    "x12_ann_ivf" -> annIvf _,
  )

  // No SQL oracle: LSH/IVF candidate sets depend on the seeded planes /
  // sampled centroids. The driver records rows-only checks; recall vs
  // the exact Q16 baseline is asserted in SimilaritySpec.
  val oracleSql: Map[String, String] = Map()
}
