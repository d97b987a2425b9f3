package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, Sketch}

/** Count–min sketch contract (one-sided error, exact-count floor,
  * determinism) and the weighted systematic sampler's inclusion
  * guarantees.
  */
class SketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma alpha alpha"),
    (2L, "beta beta gamma delta epsilon"),
    (3L, "alpha zeta eta theta beta"),
    (4L, "iota kappa lambda alpha beta gamma")
  ).toDF("doc_id", "text")

  test("CMS estimates dominate exact counts and rank deterministically") {
    val out = Sketch.cmsHeavyHitters(corpus, col("text"), d = 3, w = 16,
        k = 5)
      .select("term", "est", "cnt", "rank")
      .as[(String, Long, Long, Int)].collect().sortBy(_._4).toSeq
    assert(out.size === 5)
    // one-sided sketch error: est >= cnt always
    assert(out.forall { case (_, est, cnt, _) => est >= cnt })
    // exact counts are the true term frequencies
    val cnt = out.map(t => t._1 -> t._3).toMap
    cnt.get("alpha").foreach(c => assert(c === 5L))
    cnt.get("beta").foreach(c => assert(c === 5L))
    // ranks are 1..k in est-desc order
    assert(out.map(_._4) === (1 to 5))
    assert(out.sliding(2).forall {
      case Seq((ta, ea, _, _), (tb, eb, _, _)) =>
        ea > eb || (ea == eb && ta < tb)
      case _ => true
    })
    // partitioning-invariant
    val again = Sketch.cmsHeavyHitters(corpus.repartition(7), col("text"),
        d = 3, w = 16, k = 5)
      .select("term", "est", "cnt", "rank")
      .as[(String, Long, Long, Int)].collect().sortBy(_._4).toSeq
    assert(again === out)
  }

  test("a wide sketch with few terms is collision-free: est == cnt") {
    // 5 distinct terms into 3x1024 cells — md5 collisions would need
    // two of 5 terms sharing a cell in EVERY row; astronomically
    // unlikely, and deterministic (fixed hash), so assert exactness
    val out = Sketch.cmsHeavyHitters(corpus, col("text"), d = 3,
        w = 1024, k = 20)
      .select("est", "cnt").as[(Long, Long)].collect()
    assert(out.forall { case (est, cnt) => est === cnt })
  }

  test("md5Prefix60 column form matches the Shingles kernel") {
    val terms = Seq("alpha", "0:beta", "x y z", "").toDF("t")
    val viaCol = terms.select(Sketch.md5Prefix60(col("t")))
      .as[Long].collect().toSeq
    val viaKernel = Seq("alpha", "0:beta", "x y z", "").map(s =>
      graft.functions.Shingles.md5Prefix60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(viaCol === viaKernel)
  }

  test("weightedSystematic: heavy rows always kept, size near target") {
    val n = 2000L
    // weights 1..2000: stride = total/target; any row with w >= stride
    // must be in the sample
    val df = (0L until n).map(i => (i, i + 1)).toDF("id", "w")
    val target = 40
    val out = Sampling.weightedSystematic(df, col("id"), col("w"), target)
    val kept = out.select("id").as[Long].collect().toSet
    val total = n * (n + 1) / 2
    val stride = total / target
    (0L until n).filter(i => i + 1 >= stride).foreach(i => assert(kept(i)))
    assert(math.abs(kept.size - target) <= target / 5 + 1)
    // partitioning-invariant
    val again = Sampling.weightedSystematic(df.repartition(17), col("id"),
        col("w"), target)
      .select("id").as[Long].collect().toSet
    assert(again === kept)
  }

  test("weightedSystematic clamps non-positive weights and still samples") {
    val df = (0L until 100L).map(i => (i, 0L)).toDF("id", "w")
    val out = Sampling.weightedSystematic(df, col("id"), col("w"), 10)
    val c = out.count()
    // all weights clamp to 1: plain systematic sampling, ~10 rows
    assert(c >= 8 && c <= 12)
    assert(out.select("sample_w").as[Long].collect().forall(_ == 1L))
  }
}
