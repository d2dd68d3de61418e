package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{DedupOps, SearchOps}

/** The README's deploy shape, executed for real: a FRESH JVM whose
  * SparkSession carries the string conf
  * `spark.sql.extensions=graft.plans.GraftExtensions` (exactly what
  * `spark-submit --conf` injects — a STATIC conf, which is why this
  * cannot run inside the shared test session's pre-existing context),
  * plus the table views, serving representative operators PURELY
  * through `spark.sql`. Compares each SQL result bit-for-bit against
  * the library operator on the same session and prints SQL_DEPLOY_OK.
  * Driven by SqlDeploySpec as a subprocess; also runnable directly:
  *
  *   sbt "Test/runMain graft.SqlDeployCheck /root/testdata/sf0.001"
  */
object SqlDeployCheck {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val s2 = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s2.sparkContext.setLogLevel("ERROR")
    Graft.registerTables(s2, sf)   // views only — functions ride the conf

    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq
    def check(name: String, got: Seq[Seq[Any]], want: Seq[Seq[Any]]): Unit = {
      require(got == want, s"$name: SQL result differs from the operator")
      require(got.nonEmpty, s"$name: empty result")
      println(s"$name OK (${got.size} rows)")
    }

    // ---- q10: ANSI relational core ----------------------------------
    check("q10", rows(s2.sql(
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_orders,
        |       ROUND(sum(o_totalprice), 2) AS sum_price
        |FROM region
        |JOIN nation   ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |JOIN orders   ON c_custkey = o_custkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)),
      rows(SparkEntry.queries("q10_join_4way")(s2, sf)))

    // ---- x02: the dedup chain over the injected graft_* functions ---
    check("x02", rows(s2.sql(
      s"""WITH sets AS (
         |  SELECT doc_id,
         |    graft_shingle_hashes(split(lower(text), '\\\\s+')) AS s
         |  FROM documents
         |  WHERE size(split(lower(text), '\\\\s+')) >= 3),
         |sigs AS (
         |  SELECT doc_id,
         |    graft_minhash(transform(s, x -> pmod(x, 4294967296))) AS sig
         |  FROM sets),
         |bands AS (
         |  SELECT doc_id, band, key FROM sigs
         |  LATERAL VIEW posexplode(transform(sequence(0, 31),
         |    b -> xxhash64(slice(sig, b * 4 + 1, 4)))) t AS band, key),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         |j AS (
         |  SELECT c.da, c.db,
         |    ROUND(CAST(size(array_intersect(sa.s, sb.s)) AS BIGINT) /
         |      (size(sa.s) + size(sb.s)
         |        - size(array_intersect(sa.s, sb.s))), 4) AS jaccard
         |  FROM cand c
         |  JOIN sets sa ON sa.doc_id = c.da
         |  JOIN sets sb ON sb.doc_id = c.db)
         |SELECT da, db, jaccard FROM j
         |WHERE jaccard >= ${DedupOps.JaccardThreshold}
         |ORDER BY da, db""".stripMargin)),
      rows(DedupOps.dedupMinhashLsh(s2, sf)))

    // ---- x33b: index-served BM25 probe as SQL over index views ------
    val root = SearchOps.ensureBm25Index(s2, sf)
    s2.read.parquet(s"$root/postings")
      .createOrReplaceTempView("bm25_postings")
    s2.read.parquet(s"$root/stats").createOrReplaceTempView("bm25_stats")
    val terms = SearchOps.QueryTerms
    val tbs = terms.map(SearchOps.termBucketJvm).distinct.mkString(", ")
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN term = '$t' THEN 1 ELSE 0 END) AS df$i" }
      .mkString(", ")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"max(CASE WHEN term = '$t' THEN tf ELSE 0L END) AS tf$i" }
      .mkString(", ")
    def w(i: Int) =
      s"""ROUND(ln((n_docs - df$i + 0.5) / (df$i + 0.5) + 1.0)
         |  * (tf$i * (${SearchOps.K1} + 1.0))
         |  / (tf$i + ${SearchOps.K1}
         |      * (${1.0 - SearchOps.B} + ${SearchOps.B} * dl / avgdl)),
         |  6)""".stripMargin
    val scoreExpr = terms.indices
      .map(i => s"CASE WHEN tf$i > 0 THEN ${w(i)} ELSE 0.0D END")
      .mkString(" + ")
    val nTermsExpr = terms.indices
      .map(i => s"CASE WHEN tf$i > 0 THEN 1L ELSE 0L END")
      .mkString(" + ")
    check("x33b", rows(s2.sql(
      s"""WITH hits AS (
         |  SELECT doc_id, term, tf, dl FROM bm25_postings
         |  WHERE tb IN ($tbs) AND term IN ($termList)),
         |dfs AS (SELECT $dfCols FROM hits),
         |base AS (SELECT doc_id, max(dl) AS dl, $tfCols
         |         FROM hits GROUP BY doc_id),
         |scored AS (
         |  SELECT doc_id,
         |    ($scoreExpr) AS score0, ($nTermsExpr) AS n_terms
         |  FROM (SELECT base.*, s.n_docs,
         |          CAST(s.sum_dl AS DOUBLE) / s.n_docs AS avgdl, dfs.*
         |        FROM base CROSS JOIN bm25_stats s CROSS JOIN dfs))
         |SELECT doc_id, ROUND(score0, 4) AS score, n_terms
         |FROM scored WHERE n_terms > 0
         |ORDER BY score DESC, doc_id LIMIT ${SearchOps.TopK}""".stripMargin)),
      rows(SearchOps.bm25SearchIndexed(s2, sf)))

    println("SQL_DEPLOY_OK")
    s2.stop()
  }
}
