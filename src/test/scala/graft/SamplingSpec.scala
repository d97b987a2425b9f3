package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** Deterministic sampling/splitting: reproducibility under
  * repartitioning (the property randomSplit lacks), split-weight
  * conformance, and the per-group sample contract.
  */
class SamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val weights = Seq(("train", 80), ("val", 10), ("test", 10))

  test("splitAssign is invariant under partitioning and re-runs") {
    val df = (0L until 2000L).toDF("id")
    val a = Sampling.splitAssign(df.repartition(1), col("id"), weights)
      .select("id", "split").as[(Long, String)].collect().sortBy(_._1).toSeq
    val b = Sampling.splitAssign(df.repartition(13), col("id"), weights)
      .select("id", "split").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("splitAssign is stable under appends: old rows never move") {
    val small = Sampling.splitAssign((0L until 500L).toDF("id"), col("id"),
        weights).select("id", "split").as[(Long, String)].collect().toMap
    val big = Sampling.splitAssign((0L until 1000L).toDF("id"), col("id"),
        weights).select("id", "split").as[(Long, String)].collect().toMap
    small.foreach { case (id, s) => assert(big(id) === s) }
  }

  test("split shares approximate the requested 80/10/10 weights") {
    val n = 20000L
    val shares = Sampling.splitAssign((0L until n).toDF("id"), col("id"),
        weights)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(shares("train") / n.toDouble - 0.80) < 0.02)
    assert(math.abs(shares("val") / n.toDouble - 0.10) < 0.01)
    assert(math.abs(shares("test") / n.toDouble - 0.10) < 0.01)
  }

  test("hash buckets are near-uniform (no modulus clumping)") {
    val n = 20000L
    val counts = (0L until n).toDF("id")
      .select(Sampling.hashBucket(col("id"), 16).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    assert(counts.size === 16)
    counts.values.foreach { c =>
      assert(math.abs(c - n / 16.0) < n / 16.0 * 0.15, counts.toString)
    }
  }

  test("stratifiedSample: per-stratum rates, determinism, append-stability") {
    val n = 30000L
    val df = (0L until n).map(i => (i, if (i % 3 == 0) "en" else "zh"))
      .toDF("id", "lang")
    val fr = Seq(("en", 0.5), ("zh", 0.1))
    val out = Sampling.stratifiedSample(df, col("lang"), col("id"), fr)
    val rates = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(rates("en") / (n / 3.0) - 0.5) < 0.03)
    assert(math.abs(rates("zh") / (2 * n / 3.0) - 0.1) < 0.02)
    // defaultFraction applies to unlisted strata
    val kept = Sampling.stratifiedSample(df, col("lang"), col("id"),
      Seq(("en", 0.0)), defaultFraction = 1.0)
    assert(kept.filter(col("lang") === "en").count() === 0)
    assert(kept.filter(col("lang") === "zh").count() === 2 * n / 3)
    // deterministic across partitionings
    val a = out.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedSample(df.repartition(11), col("lang"),
      col("id"), fr).select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // membership is per-row content-addressed: a kept id stays kept in
    // any superset (append-stability)
    val half = Sampling.stratifiedSample(df.filter(col("id") < n / 2),
      col("lang"), col("id"), fr).select("id").as[Long].collect().toSet
    assert(half === a.filter(_ < n / 2).toSet)
  }

  test("importanceSample: rate tracks the per-row threshold, nested, stable") {
    val denom = 1000000
    val df = (0L until 4000L).map(i => (i, (i % 4) * (denom / 4)))
      .toDF("id", "thr")
    val kept = Sampling.importanceSample(df, col("id"), col("thr"), denom)
    // realized rate per threshold class ~ thr/denom (hash-uniform draws)
    val rates = kept.groupBy("thr").count().as[(Long, Long)].collect().toMap
    assert(!rates.contains(0L)) // threshold 0 keeps nothing
    for ((thr, cnt) <- rates) {
      val expect = 1000.0 * thr / denom
      assert(math.abs(cnt - expect) < 100, s"thr=$thr cnt=$cnt")
    }
    // nestedness: the keep set at threshold t is a subset of t' > t
    val at25 = Sampling.importanceSample(df, col("id"),
      lit(denom / 4), denom).select("id").as[Long].collect().toSet
    val at50 = Sampling.importanceSample(df, col("id"),
      lit(denom / 2), denom).select("id").as[Long].collect().toSet
    assert(at25.subsetOf(at50))
    // deterministic across partitionings
    val a = kept.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.importanceSample(df.repartition(11), col("id"),
      col("thr"), denom).select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("groupSample: exactly k per group (or the whole group), stable") {
    val df = (0L until 300L).map(i => (i, s"g${i % 4}"))
      .toDF("id", "grp")
    val out = Sampling.groupSample(df, col("grp"), col("id"), 10)
    val sizes = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 10))
    // a group smaller than k returns all of it
    val tiny = Sampling.groupSample(df.filter(col("id") < 3), col("grp"),
      col("id"), 10)
    assert(tiny.count() === 3)
    // deterministic across partitionings
    val a = out.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.groupSample(df.repartition(7), col("grp"), col("id"), 10)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("prioritySample matches the sequential brute-force selection " +
      "and estimator") {
    // deterministic weights 1..200
    val rows = (1L to 200L).map(i => (i, (i * 7) % 97 + 1))
    val df = rows.toDF("id", "w")
    val k = 10
    // brute-force replay of the exact same arithmetic
    val M = 1000000007L
    val A = 2654435761L
    def u(id: Long): Long =
      ((((id % M) * A) % M + 40503L) * A) % M % 1000000000L + 1L
    val pri = rows.map { case (id, w) =>
      (id, w, w.toDouble * 1.0e9 / u(id).toDouble)
    }.sortBy { case (id, _, p) => (-p, id) }
    val tau = pri(k)._3 // (k+1)-th priority
    val expect = pri.take(k)
      .map { case (id, w, p) => (id, w, p, math.max(w.toDouble, tau)) }
      .sortBy(_._1)
    val got = Sampling.prioritySample(df, col("id"), col("w"), k)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got === expect)
  }

  test("prioritySample: n <= k returns everything with tau = 0 " +
      "(w_hat = w); zero/negative weights are excluded") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, -4L), (4L, 7L))
      .toDF("id", "w")
    val got = Sampling.prioritySample(df, col("id"), col("w"), 10)
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 4L))
    got.foreach(r => assert(r.getDouble(3) === r.getLong(1).toDouble))
  }

  test("prioritySample is invariant under partitioning") {
    val df = (0L until 5000L).map(i => (i, i % 37 + 1)).toDF("id", "w")
    val a = Sampling.prioritySample(df.repartition(1), col("id"),
      col("w"), 25).orderBy("id").collect().toSeq
    val b = Sampling.prioritySample(df.repartition(13), col("id"),
      col("w"), 25).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("rendezvousShard: growing the fleet S -> S+1 relocates keys " +
      "ONLY to the new shard (the HRW stability guarantee)") {
    val df = (0L until 2000L).toDF("id")
    def shards(s: Int): Map[Long, Long] =
      Sampling.rendezvousShard(df, col("id"), s)
        .select("id", "shard").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    val s16 = shards(16)
    val s17 = shards(17)
    // every key either stays put or moves to the NEW shard 16 —
    // a modulus scheme would scatter movers across all shards
    s16.foreach { case (k, old) =>
      assert(s17(k) == old || s17(k) == 16L,
        s"key $k moved $old -> ${s17(k)}, not to the new shard")
    }
    // and some keys DO move (the new shard wins ~1/17 of the time)
    val moved = s16.count { case (k, old) => s17(k) != old }
    assert(moved > 0 && moved < 400, s"moved=$moved of 2000")
    // no shard is empty at 2000 keys / 16 shards
    assert(s16.values.toSet.size === 16)
  }

  test("rendezvousShard matches the brute-force argmax and is " +
      "partition-invariant") {
    val M = 1000000007L
    val A = 2654435761L
    def w(id: Long, s: Long): Long = {
      val r2 = (((((id % M) * 1000003L + s) % M) * A) % M + 40503L) * A % M
      ((r2 * r2) % M + 40503L) * A % M
    }
    val df = (0L until 500L).toDF("id")
    val got = Sampling.rendezvousShard(df.repartition(7), col("id"), 8)
      .select("id", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 500L).foreach { id =>
      val exp = (0L until 8L).maxBy(s => (w(id, s), s))
      assert(got(id) === exp, s"id=$id")
    }
  }

  test("temperature mixing (alpha = 1/2): exact thresholds on a known " +
      "spread, tiny sources cap at keep-all, fixture plan well-formed") {
    // hand-computed: sizes 10^6 / 10^8 / 10^10 → w = 1000/10000/100000,
    // Σw = 111000, all = 10,101,000,000, all div Σw = 91000 (exact).
    // tgt = 91e6 / 910e6 / 9100e6 → raw thr 91e6 / 9.1e6 / 910000:
    // both smaller sources exceed natural share and CAP at keep-all
    // (√-up-sampling keeps tiny sources whole — the intended
    // semantics); the largest lands at exactly 910000.
    val totals = Seq(("a", 1000000L), ("b", 100000000L),
      ("c", 10000000000L)).toDF("source", "src_chars")
    val got = Sampling.temperatureMixPlan(totals)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 910000L))
    // keep probability falls as 1/√n, capped: any source whose
    // √-share exceeds its natural share saturates at keep-all (that
    // is every source below the size pivot), so thresholds are
    // non-increasing in size with the largest strictly down-sampled
    val spread = Seq(("s1", 100000000L), ("s2", 10000000000L),
      ("s3", 1000000000000L)).toDF("source", "src_chars")
    val sp = Sampling.temperatureMixPlan(spread)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sp("s1") >= sp("s2") && sp("s2") > sp("s3") &&
      sp("s3") < 1000000L, s"1/sqrt(n) ordering violated: $sp")
    // fixture plan: one threshold per source, positive, on the 10⁻⁴
    // grid, never above keep-all (near-equal sources may swap order
    // by one w step — the documented floor-quantization bound)
    val plan = SparkEntry.queries("q_mixture_temperature")(
        spark, "/root/testdata/sf0.01")
      .select("source", "thr").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val srcs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(plan.keySet === srcs)
    plan.values.foreach { thr =>
      assert(thr > 0 && thr % 100 === 0 && thr <= 1000000L)
    }
  }
}
