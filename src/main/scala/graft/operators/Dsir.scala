package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.CharGramBucketCounts

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023, arXiv:2302.03169) — the canonical pretraining-data-
  * selection operator: score every raw document by how much more
  * likely a TARGET-domain bag-of-hashed-n-grams model makes it than
  * the raw-corpus model, then resample the raw corpus proportionally
  * to that importance weight.
  *
  * The three ingredients are kernels this engine already gates
  * (round-15 verdict Next #5): the hashed char-n-gram feature
  * extraction ([[graft.functions.CharGramBuckets]], the
  * q_hash_classifier kernel), the bit-length-quantized log
  * probabilities ([[TermStats.unigramSurprisal]]'s integer
  * quantization contract), and the content-addressed weighted
  * sampler ([[Sampling.importanceSample]]). DSIR composes them:
  *
  *   log w(doc) = Σ_b c_b(doc) · [log p_tgt(b) − log p_raw(b)]
  *
  * with add-1-smoothed bucket models p(b) = (cnt_b + 1)/(N + B).
  * Quantized per bucket: s_b = bits(tgt_b + 1) − bits(raw_b + 1) and
  * the shared normalizer k = bits(R + B) − bits(T + B), where
  * bits(x) = ⌊log2 x⌋ + 1 — so log w(doc) = Σ c_b·(s_b + k) is exact
  * BIGINT arithmetic end to end and a transcendental-free DuckDB
  * oracle replays it bit for bit (cross-engine `ln` ulp disagreement
  * is what rules out the float form; see unigramSurprisal).
  *
  * Scale shape: ONE corpus scan through the codegen'd gram→bucket
  * kernel into a map-side-combinable (doc, bucket) count relation
  * (≤ |docs|·buckets rows); the bucket MODELS are a ≤`buckets`-row
  * aggregate of that relation — broadcast, never a vocabulary-sized
  * state (that bounded model size is DSIR's own point: hashed n-gram
  * models train in O(buckets) no matter the corpus) — and scoring is
  * one broadcast join + per-doc sum. Resampling is the pure narrow
  * content-addressed filter. Nothing iterates; nothing collects.
  */
object Dsir {

  /** Per-(doc, bucket) hashed-gram counts with the target flag
    * carried through — the single corpus scan every downstream stage
    * reuses. Docs shorter than `n` chars have no features and drop
    * here (same contract as [[Classifier]]).
    *
    * Round-17 shape: the whole per-document count vector comes out of
    * the text scan as one row-local array
    * ([[graft.functions.CharGramBucketCounts]]) and unpacks with a
    * posexplode + cnt>0 filter — value-identical rows to the previous
    * explode-per-gram → groupBy(doc, tgt, b) form, with NO aggregation
    * exchange (the count never needed to leave the row; guide §2.4)
    * and ≤`buckets` generated rows per doc instead of one per gram.
    */
  private def features(df: DataFrame, id: Column, text: Column,
      isTarget: Column, n: Int, buckets: Int): DataFrame =
    df.filter(text.isNotNull && length(text) >= n)
      .select(id.as("doc_id"), isTarget.as("_tgt"),
        posexplode(Bridge.column(CharGramBucketCounts(
          Bridge.expression(lower(text)), n, buckets)))
          .as(Seq("_b", "cnt")))
      .filter(col("cnt") > 0L)
      .select(col("doc_id"), col("_tgt"),
        col("_b").cast("long").as("b"), col("cnt"))

  /** The per-document DSIR importance weight relation:
    * (doc_id, n_feats, logw_bits) — logw_bits the quantized
    * log2-likelihood-ratio of the doc under the target-vs-raw hashed
    * n-gram models (HIGHER = more target-like). `isTarget` marks the
    * target-domain slice (rows still score; the target is usually a
    * small high-quality subset of the same corpus, exactly DSIR's
    * setting).
    */
  def importanceWeights(df: DataFrame, id: Column, text: Column,
      isTarget: Column, n: Int = 3, buckets: Int = 64): DataFrame = {
    require(n >= 1 && buckets >= 1, "n and buckets must be >= 1")
    val feats = Bridge.persistRows(
      features(df, id, text, isTarget, n, buckets))
    val model = feats.groupBy("b")
      .agg(sum("cnt").as("raw_b"),
        sum(when(col("_tgt"), col("cnt")).otherwise(0L)).as("tgt_b"))
    val tot = model.agg(sum(col("raw_b")).as("_r"),
      sum(col("tgt_b")).as("_t"))
    val scored = model.select(col("b"),
      (length(bin(col("tgt_b") + 1)) - length(bin(col("raw_b") + 1)))
        .cast("long").as("_s"))
    feats
      .join(broadcast(scored), "b")
      .crossJoin(broadcast(tot))
      .withColumn("_k",
        (length(bin(col("_r") + lit(buckets.toLong))) -
          length(bin(col("_t") + lit(buckets.toLong)))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_feats"),
        sum(col("cnt") * (col("_s") + col("_k"))).as("logw_bits"))
  }

  /** Deterministic importance RESAMPLING over a weight relation:
    * keep probability 2^(logw_bits − max logw_bits) — the exact
    * power-of-two quantization of "sample ∝ w" that stays inside
    * integer arithmetic (thr = denom >> deficit; the max enters as a
    * broadcast scalar, the draw is [[Sampling.importanceSample]]'s
    * content-addressed bucket — no RNG state, reproducible across
    * engines and appends). Emits (…, thr, keep_bucket) for the kept
    * rows, making the draw auditable downstream.
    */
  def resample(weights: DataFrame, id: Column,
      denom: Int = 1000000): DataFrame =
    resampleAudit(weights, id, denom)
      .filter(col("kept")).drop("kept")

  /** The UNFILTERED resampling relation: every input row with its
    * threshold, content-addressed draw, and the `kept` verdict — the
    * auditable form ([[resample]] is this filtered to `kept`). DSIR
    * weights are log-likelihood-ratio SUMS over a doc's grams, so
    * their spread grows with document length and the ∝-2^logw keep
    * probability is intentionally top-heavy (the paper's setting
    * resamples a small target-sized subset from a huge raw corpus);
    * the audit relation is what a pipeline inspects to size the
    * selection before committing to the filter.
    */
  def resampleAudit(weights: DataFrame, id: Column,
      denom: Int = 1000000): DataFrame = {
    require(denom >= 1, "denom must be >= 1")
    val mx = weights.agg(max(col("logw_bits")).as("_mx"))
    // a deficit of >= bits(denom) forces thr to 0 mathematically; the
    // CASE arm also keeps the shift far from the 64-bit wraparound
    // both engines would otherwise hit (Java shiftleft wraps mod 64,
    // DuckDB << errors)
    val cut = 64 - java.lang.Long.numberOfLeadingZeros(denom.toLong)
    weights.crossJoin(broadcast(mx))
      .withColumn("_d", (col("_mx") - col("logw_bits")).cast("int"))
      .withColumn("thr",
        when(col("_d") >= cut, lit(0L)).otherwise(
          expr(s"$denom DIV shiftleft(CAST(1 AS BIGINT), _d)")))
      .drop("_mx", "_d")
      .withColumn("keep_bucket", Sampling.hashBucket(id, denom))
      .withColumn("kept", col("keep_bucket") < col("thr"))
  }
}
