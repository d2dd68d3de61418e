package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING and APPLICATION (Sennrich et al., ACL 2016)
  * — the iterated form of x46's single pair-count round.
  *
  * Scale contract (the reason BPE is corpus-feasible at all, and the
  * same shape x46 documents): the ONLY corpus-sized work is one
  * word-frequency aggregate (map-side combined, shuffle carries
  * distinct words). Every training round after that — pair counting,
  * argmax, merge application — runs on the DISTINCT-WORD vocabulary,
  * Heaps'-law sized, orders of magnitude smaller than the corpus.
  * Application (segmentation) is again vocab-sized: each distinct
  * word is segmented once and the corpus joins the segmentation table
  * on the word — no per-occurrence re-derivation.
  *
  * The merge pick is deterministic (count DESC, pair ASC — x46's
  * rule) and the picked pair rides a one-row broadcast into the merge
  * lambda, so no data-dependent value touches the driver during
  * training. */
object BpeOps {

  /** The x46 vocabulary rule: lowercased whitespace words, ≥ 2 chars. */
  private[graft] def vocabOf(docsFrame: DataFrame): DataFrame = {
    val s = docsFrame.sparkSession
    import s.implicits._
    docsFrame
      .select(explode(split(lower(trim($"text")), "\\s+")).as("word"))
      .filter(length($"word") >= 2)
      .groupBy($"word").agg(count(lit(1)).as("freq"))
  }

  /** word → its character symbols (`col` is a column NAME). */
  private def charsCol(col: String): Column =
    expr(s"transform(sequence(1, length($col)), i -> substring($col, i, 1))")

  /** Greedy left-to-right application of ONE merge (a, b) to a symbol
    * array — the classic BPE replace pass as a fold: append, or fuse
    * with the previous symbol when (prev, cur) = (a, b). After a fuse
    * the new tail a||b can itself pair with the NEXT symbol only via
    * a later round, exactly like the reference algorithm's scan. */
  private val applyMergeExpr: String =
    """aggregate(syms, CAST(array() AS ARRAY<STRING>),
      |  (acc, x) -> CASE
      |    WHEN size(acc) > 0 AND element_at(acc, -1) = a AND x = b
      |    THEN concat(slice(acc, 1, size(acc) - 1), array(concat(a, b)))
      |    ELSE concat(acc, array(x)) END)""".stripMargin

  /** Train `nMerges` BPE merges over a (doc_id, text) frame. Returns
    * (merges, segmented vocabulary):
    *
    *  - merges: (round, a, b, n) — the learned merge table in pick
    *    order, the artifact a tokenizer ships;
    *  - vocab:  (word, freq, syms) — every distinct word's final
    *    segmentation under those merges.
    *
    * Each round: count adjacent symbol pairs weighted by word freq
    * (vocab-sized aggregate), pick the max (count DESC, pair ASC),
    * broadcast the one-row pick, fuse it everywhere. The per-round
    * checkpoint bounds lineage — rounds are sequential by nature
    * (merge r+1 counts pairs that exist only after merge r). */
  def bpeTrain(docsFrame: DataFrame,
               nMerges: Int): (DataFrame, DataFrame) = {
    val s = docsFrame.sparkSession
    import s.implicits._
    var vocab = vocabOf(docsFrame)
      .select($"word", $"freq", charsCol("word").as("syms"))
      .localCheckpoint(false)
    val merges = Seq.newBuilder[DataFrame]
    for (r <- 0 until nMerges) {
      val top = vocab
        .select($"freq", explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS a,
            |              element_at(syms, i + 1) AS b))""".stripMargin))
          .as("p"))
        .groupBy($"p.a", $"p.b").agg(sum($"freq").as("n"))
        .orderBy($"n".desc, $"a", $"b").limit(1)
        .withColumn("round", lit(r.toLong))
        .localCheckpoint(false)
      merges += top
      vocab = vocab.crossJoin(broadcast(top.select($"a", $"b")))
        .select($"word", $"freq", expr(applyMergeExpr).as("syms"))
        .localCheckpoint(false)
    }
    val mergeTable = merges.result()
      .reduceOption(_ unionAll _)
      .map(_.select($"round", $"a", $"b", $"n"))
      .getOrElse(s.emptyDataFrame
        .select(lit(0L).as("round"), lit("").as("a"), lit("").as("b"),
          lit(0L).as("n")).limit(0))
    (mergeTable, vocab)
  }

  /** Segment a (doc_id, text) corpus with a TRAINED merge table: the
    * corpus's distinct words join the vocab segmentation (each word
    * segmented once, at training time), and out-of-vocabulary words
    * fall back to character symbols — the standard open-vocabulary
    * guarantee. Output: (doc_id, word, syms) per word occurrence. */
  def bpeSegment(docsFrame: DataFrame, trainedVocab: DataFrame): DataFrame = {
    val s = docsFrame.sparkSession
    import s.implicits._
    val words = docsFrame
      .select($"doc_id",
        explode(split(lower(trim($"text")), "\\s+")).as("word"))
      .filter(length($"word") >= 2)
    words.join(broadcast(trainedVocab.select($"word", $"syms")),
        Seq("word"), "left")
      .select($"doc_id", $"word",
        coalesce($"syms", charsCol("word")).as("syms"))
  }
}
