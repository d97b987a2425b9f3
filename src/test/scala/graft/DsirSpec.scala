package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

/** DSIR importance weights + deterministic resampling: the signal
  * direction (target-like text weighs more per gram), the audit/filter
  * contract, and partitioning invariance.
  */
class DsirSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // target vocabulary is disjoint from the raw bulk's, so the bucket
  // models separate cleanly: docs 0-3 are the target slice, 4-11 the
  // raw bulk, and docs 20/21 are fresh probes written in each style
  private val corpus = (
    (0L to 3L).map(i => (i, "alpha beta gamma delta alpha beta", true)) ++
    (4L to 11L).map(i => (i, "zog qix wub vex zog qix wub vex", false)) ++
    Seq((20L, "alpha beta gamma delta", false),
      (21L, "zog qix wub vex", false))
  ).toDF("doc_id", "text", "is_tgt")

  private def weights() = Dsir.importanceWeights(corpus, col("doc_id"),
    col("text"), col("is_tgt"), n = 3, buckets = 64)

  test("signal direction: a target-styled probe out-weighs a " +
      "raw-styled probe per gram") {
    val w = weights().as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val (nf20, lw20) = w(20L)
    val (nf21, lw21) = w(21L)
    // per-gram comparison, cross-multiplied (the probes differ in
    // gram count): lw20/nf20 > lw21/nf21
    assert(lw20 * nf21 > lw21 * nf20,
      s"target-styled probe must out-weigh the raw-styled one per " +
        s"gram ($lw20/$nf20 vs $lw21/$nf21)")
  }

  test("resample == resampleAudit filtered to kept; thresholds are " +
      "the power-of-two ladder off the max weight") {
    val w = weights()
    val audit = Dsir.resampleAudit(w, col("doc_id"))
      .orderBy("doc_id")
      .select("doc_id", "thr", "keep_bucket", "kept")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(audit.nonEmpty)
    audit.foreach { case (_, thr, kb, kept) =>
      assert(kept === (kb < thr))
      assert(thr >= 0L && thr <= 1000000L)
    }
    // the max-weight doc's threshold is the full denominator
    val wRows = w.as[(Long, Long, Long)].collect()
    val top = wRows.maxBy(_._3)._1
    assert(audit.find(_._1 == top).get._2 === 1000000L)
    val sampled = Dsir.resample(w, col("doc_id"))
      .orderBy("doc_id").select("doc_id")
      .as[Long].collect().toSeq
    assert(sampled === audit.filter(_._4).map(_._1))
  }

  test("degenerate ALL-EQUAL weights: deficit 0 everywhere, thr = " +
      "denom, every row kept (round-16 standing item, pinned early)") {
    val same = (0L to 5L).map(i => (i, "identical text body", i < 2))
      .toDF("doc_id", "text", "is_tgt")
    val w = Dsir.importanceWeights(same, col("doc_id"), col("text"),
      col("is_tgt"), n = 3, buckets = 64)
    val audit = Dsir.resampleAudit(w, col("doc_id"))
      .select("doc_id", "thr", "kept")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(audit.size === 6)
    assert(audit.forall { case (_, thr, kept) => thr == 1000000L && kept },
      audit.toString)
  }

  test("denom=1 edge (round-16 verdict sweep): keeps exactly the " +
      "max-weight class, zero-threshold drops everything else, no " +
      "shift wraparound") {
    val w = weights()
    val audit = Dsir.resampleAudit(w, col("doc_id"), denom = 1)
      .select("doc_id", "thr", "keep_bucket", "kept")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(audit.nonEmpty)
    val wRows = w.select("doc_id", "logw_bits")
      .as[(Long, Long)].collect().toMap
    val mx = wRows.values.max
    audit.foreach { case (id, thr, kb, kept) =>
      assert(kb === 0L) // hashBucket(id, 1) is always 0
      if (wRows(id) == mx) {
        // deficit 0: thr = 1 DIV 1 = 1, bucket 0 < 1 → kept
        assert(thr === 1L && kept, s"max-weight doc $id dropped")
      } else {
        // any deficit ≥ cut(=1 bit) zeroes the threshold
        assert(thr === 0L && !kept, s"sub-max doc $id kept at denom=1")
      }
    }
  }

  test("weights are partitioning-invariant and drop sub-n docs") {
    val base = weights().orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    val re = Dsir.importanceWeights(corpus.repartition(7),
        col("doc_id"), col("text"), col("is_tgt"), n = 3, buckets = 64)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(base === re)
    val withShort = corpus.union(Seq((99L, "ab", false))
      .toDF("doc_id", "text", "is_tgt"))
    val ws = Dsir.importanceWeights(withShort, col("doc_id"),
        col("text"), col("is_tgt"), n = 3, buckets = 64)
      .as[(Long, Long, Long)].collect()
    assert(!ws.exists(_._1 == 99L), "sub-n docs have no features")
  }
}
