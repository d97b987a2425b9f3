package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DotProduct, Ema, MinHashBands, MinHashSignature,
  Shingles, SimHash, SortedOverlapCount}

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

  /** name → (usage doc, builder). */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("ema",
      "ema(x, alpha) - recursive exponential moving average window function",
      c => Ema(c(0), c(1))),
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
      c => SortedOverlapCount(c(0), c(1))))

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
