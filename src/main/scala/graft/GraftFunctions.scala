package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.IntegerType

import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CharGramBuckets, Cusum, DotProduct, Ema,
  GramSetCount, LongDot, MinHashBands, MinHashSignature,
  MinHashSignatureMod, NfcNormalize, PunctCount, Shingles, SimHash,
  SortedOverlapCount, SubtokenCount, WordSetCount}

/** SQL surface for graft's custom expressions.
  *
  * Two registration paths:
  *  - builder-time: `spark.sql.extensions=graft.GraftExtensions` (or
  *    `.withExtensions(new GraftExtensions)`) — the standard drop-in
  *    library mechanism;
  *  - live session: `GraftFunctions.register(spark)` for sessions that
  *    already exist (tests, notebooks).
  *
  * After either, plain SQL works:
  * {{{
  *   SELECT ema(close, 2.0/13.0) OVER
  *     (PARTITION BY symbol ORDER BY ts
  *      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
  *   FROM bars
  * }}}
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  private def strArg(e: Expression, name: String): String = e match {
    case Literal(v: UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$name expects a string literal, got $other")
  }

  /** name → (usage doc, builder). */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("ema",
      "ema(x, alpha) - recursive exponential moving average window function",
      c => Ema(c(0), c(1))),
    ("cusum",
      "cusum(d) - clamped running sum max(0, s + d) window function " +
        "(one-sided CUSUM chart)",
      c => Cusum(c(0))),
    ("nfc_normalize",
      "nfc_normalize(text) - Unicode NFC canonical composition " +
        "(DuckDB-name-compatible)",
      c => NfcNormalize(c(0))),
    ("simhash",
      "simhash(array<string>) - 64-bit SimHash of a feature array",
      c => SimHash(c(0))),
    ("minhash_signature",
      "minhash_signature(array<string>, k) - k-component MinHash signature",
      c => MinHashSignature(c(0), intArg(c(1), "minhash_signature k"))),
    ("minhash_bands",
      "minhash_bands(array<string>, k, b) - b LSH band keys over a k-MinHash",
      c => MinHashBands(c(0), intArg(c(1), "minhash_bands k"),
        intArg(c(2), "minhash_bands b"))),
    ("minhash_signature_mod",
      "minhash_signature_mod(array<long>, k) - k-component mod-p " +
        "(p=2^61-1) MinHash over pre-hashed grams, SQL-replayable",
      c => MinHashSignatureMod(c(0),
        intArg(c(1), "minhash_signature_mod k"))),
    ("shingles",
      "shingles(array<string>, n) - distinct word n-gram shingles",
      c => Shingles(c(0), intArg(c(1), "shingles n"))),
    ("shingles_hashed",
      "shingles_hashed(array<string>, n) - distinct 64-bit-hashed word n-gram shingles (xxhash64 seed 42)",
      c => Shingles(c(0), intArg(c(1), "shingles_hashed n"), hashed = true)),
    ("dot_product",
      "dot_product(array<double>, array<double>) - ordered-fold dot product",
      c => DotProduct(c(0), c(1))),
    ("sorted_overlap",
      "sorted_overlap(array<bigint>, array<bigint>) - intersection size of two sorted distinct arrays",
      c => SortedOverlapCount(c(0), c(1))),
    ("punct_count",
      "punct_count(text) - single-pass count of [^A-Za-z0-9\\s] code points",
      c => PunctCount(c(0))),
    ("subtoken_count",
      "subtoken_count(text) - single-pass BPE-ish pre-token count ([A-Za-z]+|[0-9]|mark)",
      c => SubtokenCount(c(0))),
    ("word_set_count",
      "word_set_count(text, 'w1,w2,…') - whole-word occurrences of any listed word",
      c => WordSetCount(c(0),
        strArg(c(1), "word_set_count words").split(',').toSeq)),
    ("gram_set_count",
      "gram_set_count(text, 'g1,g2,…') - non-overlapping ordered-alternation literal-gram count",
      c => GramSetCount(c(0),
        strArg(c(1), "gram_set_count grams").split(',').toSeq)),
    ("long_dot",
      "long_dot(array<bigint>, array<bigint>) - exact 64-bit integer dot product",
      c => LongDot(c(0), c(1))),
    ("char_gram_buckets",
      "char_gram_buckets(text, n, mod) - md5-prefix bucket id per code-point n-gram",
      c => CharGramBuckets(c(0), intArg(c(1), "char_gram_buckets n"),
        intArg(c(2), "char_gram_buckets mod"))))

  def inject(ext: SparkSessionExtensions): Unit = {
    all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofKernels)
  }

  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, _, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.RewriteHofKernels)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteHofKernels
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
