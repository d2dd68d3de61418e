package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: injects every graft function at
  * session build, so a deployment enables the library with
  *
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`) and
  * the functions exist in EVERY session from the start — no per-session
  * `GraftExpressions.register` call, and catalogs/views can reference
  * them immediately. The imperative register() path stays for ad-hoc
  * sessions; both routes build the identical expression trees.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier(GraftExpressions.CosineFn),
      info(GraftExpressions.CosineFn,
        "cosine similarity of two double arrays (fused codegen loop)"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    e.injectFunction((FunctionIdentifier(GraftExpressions.MinHashFn),
      info(GraftExpressions.MinHashFn,
        "128-permutation minhash signature of a long-hash array"),
      (es: Seq[Expression]) => MinHashSignature(es.head)))
    e.injectFunction((FunctionIdentifier(GraftExpressions.SimHashFn),
      info(GraftExpressions.SimHashFn,
        "64-bit simhash of a token-hash array"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier(GraftExpressions.HyperplaneFn),
      info(GraftExpressions.HyperplaneFn,
        "random-hyperplane LSH bucket of an integer-quantized vector"),
      (es: Seq[Expression]) => HyperplaneSignature(es.head)))
    e.injectFunction((FunctionIdentifier(GraftExpressions.LongDotFn),
      info(GraftExpressions.LongDotFn,
        "exact integer dot product of two long arrays"),
      (es: Seq[Expression]) => LongDotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier(GraftExpressions.ShinglesFn),
      info(GraftExpressions.ShinglesFn,
        "distinct word-3-gram shingles of a token array"),
      (es: Seq[Expression]) => WordShingles(es.head)))
    e.injectFunction((FunctionIdentifier(GraftExpressions.TopKFn),
      info(GraftExpressions.TopKFn,
        "bounded-heap top-k (score, id) pairs per group"),
      (es: Seq[Expression]) => GraftExpressions.buildTopK(es)))
    e.injectFunction((FunctionIdentifier(GraftExpressions.WordSetCountFn),
      info(GraftExpressions.WordSetCountFn,
        "count of word-char runs matching a constant word set " +
          "(ASCII/RE2 boundary semantics)"),
      (es: Seq[Expression]) => WordSetCount(es(0),
        GraftExpressions.foldableString(es(1),
          GraftExpressions.WordSetCountFn))))
    e.injectFunction((FunctionIdentifier(GraftExpressions.CharSetCountFn),
      info(GraftExpressions.CharSetCountFn,
        "count of characters in a constant ASCII char set"),
      (es: Seq[Expression]) => CharSetCount(es(0),
        GraftExpressions.foldableString(es(1),
          GraftExpressions.CharSetCountFn))))
    e.injectFunction((FunctionIdentifier(GraftExpressions.BlockHashesFn),
      info(GraftExpressions.BlockHashesFn,
        "128-bit content keys of every k-word sliding window of a " +
          "token array"),
      (es: Seq[Expression]) => BlockWindowHashes(es(0),
        GraftExpressions.foldableInt(es(1),
          GraftExpressions.BlockHashesFn))))
    e.injectFunction((FunctionIdentifier(GraftExpressions.BigramHashesFn),
      info(GraftExpressions.BigramHashesFn,
        "adjacent word-pair keys of a token array as 64-bit word hashes"),
      (es: Seq[Expression]) => BigramHashes(es.head)))
    e.injectFunction((FunctionIdentifier(GraftExpressions.ShingleHashesFn),
      info(GraftExpressions.ShingleHashesFn,
        "distinct word-3-gram shingles of a token array as 64-bit hashes"),
      (es: Seq[Expression]) => WordShingleHashes(es.head)))
    e.injectFunction((FunctionIdentifier(GraftExpressions.ZOrderFn),
      info(GraftExpressions.ZOrderFn,
        "Morton/Z-order interleave of the low 16 bits of two bigints"),
      (es: Seq[Expression]) => ZOrderKey(es(0), es(1))))
  }
}
