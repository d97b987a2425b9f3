package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CharGramBuckets, Shingles}

/** Hashed bag-of-character-n-grams linear classifier inference — the
  * fasttext architecture (Joulin et al. 2016) that production corpus
  * pipelines run at scale for quality/language/topic gating: hash
  * every char n-gram into a fixed bucket space, score each class as a
  * weight-matrix row dotted with the bucket-count feature vector,
  * predict the argmax.
  *
  * The weight matrix here is a deterministic md5-derived stand-in
  * (small integers in [-3, 3]) so the whole inference path is
  * oracle-checkable end to end; a trained model would arrive as
  * exactly the same (class, bucket, weight) broadcast relation and
  * nothing else in the plan would change.
  *
  * Scale shape: feature extraction is a codegen'd one-pass kernel
  * ([[CharGramBuckets]]) followed by a map-side-combinable
  * (doc, bucket) count aggregate — the corpus is scanned once and at
  * most |docs|·min(|grams|, buckets) feature rows ever shuffle. The
  * weight matrix (classes·buckets rows) broadcasts; scoring is one
  * partial-aggregated (doc, class) sum and the argmax one struct-min
  * aggregate — no window, no second corpus scan. All integer
  * arithmetic (counts × small weights), so scores and tie-breaks
  * (highest score, then lowest class id) are bit-stable anywhere.
  */
object Classifier {

  /** Deterministic stand-in weight: md5₆₀("w:c:b") mod 7 − 3 ∈ [-3, 3]
    * — matches DuckDB
    * `('0x'||substr(md5('w:'||c||':'||b),1,15))::BIGINT % 7 - 3`.
    */
  private def weight(c: Int, b: Int): Long =
    Shingles.md5Prefix60(UTF8String.fromString(s"w:$c:$b")) % 7 - 3

  /** The hashed bucket-count feature relation (id, b, cnt) — one scan
    * of the corpus through the codegen'd gram→bucket kernel, shared by
    * [[hashNgramPredict]] (all-class argmax) and [[hashNgramScore]]
    * (single-class scorer).
    */
  private def features(df: DataFrame, id: Column, text: Column,
      n: Int, buckets: Int): DataFrame =
    df.filter(text.isNotNull && length(text) >= n)
      .select(id.as("id"),
        explode(Bridge.column(CharGramBuckets(
          Bridge.expression(lower(text)), n, buckets))).as("b"))
      .groupBy("id", "b").agg(count(lit(1)).as("cnt"))

  /** One class's raw score per document: (id, score) — the shape an
    * eval pass consumes (ROC AUC, calibration bins need ONE scalar
    * score per example, not the argmax). Same feature scan and
    * broadcast weights as [[hashNgramPredict]], minus the argmax.
    */
  def hashNgramScore(df: DataFrame, id: Column, text: Column,
      cls: Int, n: Int = 3, buckets: Int = 64): DataFrame = {
    require(cls >= 0 && buckets >= 1, "cls and buckets must be >= 0/1")
    val spark = df.sparkSession
    import spark.implicits._
    val wts = (0 until buckets).map(b => (b.toLong, weight(cls, b)))
      .toDF("b", "w")
    features(df, id, text, n, buckets)
      .join(broadcast(wts), "b")
      .groupBy(col("id"))
      .agg(sum(col("w") * col("cnt")).as("score"))
  }

  /** Per-document predicted class and score: (id, cls, score), one
    * row per input document with at least `n` characters.
    */
  def hashNgramPredict(df: DataFrame, id: Column, text: Column,
      classes: Int = 3, n: Int = 3, buckets: Int = 64): DataFrame = {
    require(classes >= 1 && buckets >= 1, "classes and buckets must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val feats = features(df, id, text, n, buckets)
    val wts = (0 until classes).flatMap(c => (0 until buckets).map(b =>
      (c.toLong, b.toLong, weight(c, b)))).toDF("c", "b", "w")
    feats.join(broadcast(wts), "b")
      .groupBy(col("id"), col("c"))
      .agg(sum(col("w") * col("cnt")).as("score"))
      // argmax(score), ties to the lowest class id, as ONE struct-min
      // aggregate (no per-doc rank window)
      .groupBy(col("id"))
      .agg(min(struct((-col("score")).as("neg"), col("c").as("cls"),
        col("score").as("score"))).as("best"))
      .select(col("id"), col("best.cls").as("cls"),
        col("best.score").as("score"))
  }
}
