package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over the relational tables — the capability class
  * behind the reference's LATENT repo-importance scoring (the declared
  * but never-used `github-events:repo-score` key,
  * `/root/reference/redis-key-generator.js:5`): ranking entities by
  * the structure of their interactions, not just their counts.
  *
  * PageRank (Page, Brin, Motwani & Winograd 1999) over the bipartite
  * customer↔supplier graph induced by orders: an entity is important
  * if important entities trade with it. The same shape ranks repos by
  * contributor attention in the reference's domain, or sources by
  * cross-link mass in a crawl-curation pipeline.
  *
  * Scale shape: edges are a distinct projection of the fact join;
  * each iteration is ONE shuffle round (edges ⋈ ranks on src, then a
  * hash aggregate on dst) — the canonical distributed PageRank step,
  * work ∝ |edges| per iteration, lineage truncated per round so the
  * plan stays O(1). No driver-side data path; the final cut is a
  * bounded top-K.
  *
  * Oracle-exactness: the x12 unrolled-iteration discipline — ranks
  * ride micro-units (1e6-scaled BIGINTs), per-edge contributions are
  * FLOOR integer divisions (`r div deg`), the damping update is
  * `150000 + (85 · Σ) div 100`, all order-free integer sums — DuckDB
  * replays the identical three iterations bit for bit. */
object GraphOps {

  val PrIters = 3
  val PrTopK = 20
  /** Micro-unit scale and the 0.85 damping split in integer parts. */
  val PrUnit = 1000000L

  /** The converged full-node rank relation (node, r) — the training
    * form: graph build + `PrIters` propagation rounds. Customers take
    * even node ids (2k), suppliers odd (2k+1), so one BIGINT key
    * carries both sides without collision. Both directions are
    * materialized (the bipartite walk), so no node dangles. Runs at
    * INDEX BUILD, never on the serve path. */
  def convergedRanks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the fact join + distinct is the expensive subtree, and it feeds
    // FOUR consumers (both union branches, each appearing again under
    // the deg aggregate) — checkpoint it once or the join runs 4×
    val pairs = Tables.lineitem(s, d).select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("src"),
        ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
      .localCheckpoint(false)
    val edges = pairs
      .unionAll(pairs.select($"dst".as("src"), $"src".as("dst")))
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    // (src, dst, deg) — the per-iteration join fabric, materialized once
    val fabric = edges.join(deg, "src").localCheckpoint(false)
    var ranks = deg.select($"src".as("node"), lit(PrUnit).as("r"))
    for (_ <- 1 to PrIters) {
      // rank state is node-sized (2 longs per node) — broadcast it into
      // the cached fabric so no iteration re-shuffles the edge relation;
      // the only per-round shuffle is the partial-aggregated dst sum.
      // (At node counts past broadcast range, drop the hint and the
      // join falls back to the shuffle form — a conf, not a rewrite.)
      ranks = fabric
        .join(broadcast(ranks.select($"node".as("src"), $"r")), "src")
        .groupBy($"dst")
        .agg(sum(expr("r div deg")).as("m"))
        .select($"dst".as("node"),
          (lit(150000L) + expr("(85 * m) div 100")).as("r"))
    }
    ranks
  }

  /** Materialized converged ranks for a corpus dir (the ensure
    * discipline every serving artifact follows — content-keyed path
    * over BOTH source tables, staged rename, `ranks/_SUCCESS`
    * marker). PageRank is periodic-batch work in production: the
    * graph changes slowly, queries ask for current ranks constantly —
    * so the convergence loop runs ONCE per corpus snapshot and every
    * query is an artifact read. */
  def ensureRankIndex(s: SparkSession, d: String,
                      indexRoot: String = sys.props("java.io.tmpdir")): String =
    ArtifactBuild.ensure(s, SimilarityOps.indexPathMulti(
        s, d, Seq("lineitem.parquet", "orders.parquet"),
        "pagerank", "v1", indexRoot),
        "ranks/_SUCCESS") { staging =>
      convergedRanks(s, d).write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(staging, "ranks").toString)
    }

  /** x66 — integer-exact PageRank, SERVED from the materialized rank
    * artifact: the plan is one FileScan of the converged (node, r)
    * table + projection + TakeOrdered(20) — no join, no iteration, no
    * fact-table scan at serve time (plan-pinned). Training math is
    * exact integer arithmetic, so the artifact replays bit-for-bit
    * what the in-plan form computes — the unrolled-CTE DuckDB oracle
    * validates THIS entry, and GraphSpec pins served ≡ in-plan. */
  def pageRank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val root = ensureRankIndex(s, d)
    ArtifactBuild.readCached(s, s"$root/ranks")
      .select($"node", $"r".as("rank"),
        when($"node" % 2 === 0, "customer").otherwise("supplier").as("kind"),
        expr("node div 2").as("key"))
      .orderBy($"rank".desc, $"node")
      .limit(PrTopK)
  }

  /** The one-plan form (build + converge + cut in a single query) —
    * the equivalence witness for the artifact-served x66. */
  def pageRankInline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    convergedRanks(s, d)
      .select($"node", $"r".as("rank"),
        when($"node" % 2 === 0, "customer").otherwise("supplier").as("kind"),
        expr("node div 2").as("key"))
      .orderBy($"rank".desc, $"node")
      .limit(PrTopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x66_pagerank" -> pageRank _,
  )

  /** Three unrolled iterations as CTEs — identical integer arithmetic,
    * identical floor divisions, so ranks match bitwise. */
  private def prIterCte(i: Int, prev: String): String =
    s"""r$i AS (
       |  SELECT e.dst AS node,
       |    150000 + (85 * CAST(sum(p.r // e.deg) AS BIGINT)) // 100 AS r
       |  FROM fabric e JOIN $prev p ON p.node = e.src
       |  GROUP BY e.dst)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "x66_pagerank" ->
      s"""WITH pairs AS (
        |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS (
        |  SELECT src, dst FROM pairs
        |  UNION ALL SELECT dst AS src, src AS dst FROM pairs),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
        |        FROM edges GROUP BY src),
        |fabric AS (SELECT e.src, e.dst, d.deg
        |           FROM edges e JOIN deg d USING (src)),
        |r0 AS (SELECT src AS node, CAST($PrUnit AS BIGINT) AS r FROM deg),
        |${prIterCte(1, "r0")},
        |${prIterCte(2, "r1")},
        |${prIterCte(3, "r2")}
        |SELECT node, r AS rank,
        |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
        |  node // 2 AS key
        |FROM r3 ORDER BY rank DESC, node LIMIT $PrTopK""".stripMargin,
  )
}
