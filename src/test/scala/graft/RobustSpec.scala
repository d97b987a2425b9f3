package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Robust

/** Hand-computed goldens for the robust MAD outlier profile. */
class RobustSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Plain-Scala PERCENTILE_CONT(0.5): i = 0.5·(n−1), lo + (hi−lo)·frac.
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val i = 0.5 * (s.size - 1)
    val (lo, hi) = (s(i.floor.toInt), s(i.ceil.toInt))
    lo + (hi - lo) * (i - i.floor)
  }

  test("madProfile matches the brute-force median/MAD/outlier count") {
    val a = Seq(1.0, 2.0, 3.0, 4.0, 100.0) // median 3, MAD 1, 100 is out
    val b = Seq(10.0, 12.0, 14.0, 16.0) // even n: interpolated median 13
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val out = Robust.madProfile(df, col("g"), col("v"), k = 3.0)
      .select(col("_g"), col("med"), col("mad"), col("n"),
        col("n_outliers"))
      .as[(String, Double, Double, Long, Long)].collect()
      .sortBy(_._1).toSeq

    def brute(xs: Seq[Double], k: Double) = {
      val med = median(xs)
      val mad = median(xs.map(x => math.abs(x - med)))
      (med, mad, xs.size.toLong,
        xs.count(x => math.abs(x - med) > k * mad).toLong)
    }
    val (ma, mada, na, oa) = brute(a, 3.0)
    val (mb, madb, nb, ob) = brute(b, 3.0)
    assert(out === Seq(("a", ma, mada, na, oa), ("b", mb, madb, nb, ob)))
    assert(oa === 1L) // 100 is the one outlier
    assert(ob === 0L)
  }

  test("nulls are excluded and an all-equal group has MAD 0") {
    val df = Seq(("c", Some(5.0)), ("c", Some(5.0)), ("c", None),
      ("c", Some(5.0))).toDF("g", "v")
    val out = Robust.madProfile(df, col("g"), col("v"))
      .select(col("med"), col("mad"), col("n"), col("n_outliers"))
      .as[(Double, Double, Long, Long)].collect().toSeq
    assert(out === Seq((5.0, 0.0, 3L, 0L)))
  }

  test("a constant group with one spike flags the spike even at MAD 0") {
    // MAD 0 ⇒ any deviation > 0 is an outlier (strict inequality)
    val df = (Seq.fill(9)(1.0) :+ 50.0).map(("d", _)).toDF("g", "v")
    val out = Robust.madProfile(df, col("g"), col("v"))
      .select(col("mad"), col("n_outliers"))
      .as[(Double, Long)].collect().toSeq
    assert(out === Seq((0.0, 1L)))
  }

  test("winsorize clips to the exact interpolated bounds and flags") {
    val xs = (1 to 100).map(_.toDouble)
    val df = xs.map(("g", _)).toDF("g", "v")
    val out = Robust.winsorize(df, col("g"), col("v"), 0.05, 0.95)
      .select(col("v"), col("winsorized"), col("clipped"))
      .as[(Double, Double, Boolean)].collect().sortBy(_._1).toSeq
    // i_lo = 0.05*99 = 4.95 → lo=5,hi=6,f=.95 → 5.95; i_hi = 94.05 → 95.05
    out.foreach { case (v, wv, cl) =>
      val expect = math.min(math.max(v, 5.95), 95.05)
      assert(math.abs(wv - expect) < 1e-12, s"winsorized($v)")
      assert(cl === (v < 5.95 || v > 95.05), s"clipped($v)")
    }
    assert(out.count(_._3) === 10) // 1..5 and 96..100
  }

  test("winsorize passes original columns through and drops nulls") {
    val df = Seq((1L, "g", Some(1.0)), (2L, "g", None), (3L, "g", Some(9.0)),
      (4L, "g", Some(5.0))).toDF("id", "g", "v")
    val out = Robust.winsorize(df, col("g"), col("v"), 0.25, 0.75)
    assert(out.columns.toSeq ===
      Seq("id", "g", "v", "winsorized", "clipped"))
    assert(out.count() === 3)
  }

  test("random groups match brute force") {
    val rnd = new scala.util.Random(7)
    val data = (0 until 500).map(i =>
      (s"g${i % 3}", math.rint(rnd.nextGaussian() * 50) / 10.0))
    val out = Robust.madProfile(data.toDF("g", "v"), col("g"), col("v"),
        k = 2.0)
      .select(col("_g"), col("med"), col("mad"), col("n_outliers"))
      .as[(String, Double, Double, Long)].collect().sortBy(_._1).toSeq
    val expect = data.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rows) =>
      val xs = rows.map(_._2)
      val med = median(xs)
      val mad = median(xs.map(x => math.abs(x - med)))
      (g, med, mad, xs.count(x => math.abs(x - med) > 2.0 * mad).toLong)
    }
    assert(out === expect)
  }

  // Discrete (ranked-element) statistic used by rollingRobust: the
  // sorted sequence's 1-based element at ⌈n/2⌉ — no interpolation.
  private def discMedian(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(math.ceil(s.size / 2.0).toInt - 1)
  }

  test("rollingRobust matches a brute-force trailing-frame scan") {
    val rnd = new scala.util.Random(13)
    val data = for { g <- Seq("a", "b"); t <- 0 until 60 }
      yield (g, t.toLong, math.rint(rnd.nextGaussian() * 100) / 10.0)
    val frame = 7
    val out = Robust.rollingRobust(data.toDF("g", "t", "v"), col("g"),
        col("t"), col("v"), frame = frame, k = 3.0)
      .select(col("g"), col("t"), col("roll_med"), col("roll_mad"),
        col("is_anomaly"))
      .as[(String, Long, Double, Double, Boolean)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val expect = data.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val vs = rows.sortBy(_._2)
      vs.indices.map { i =>
        val fr = vs.slice(math.max(0, i - frame + 1), i + 1).map(_._3)
        val med = discMedian(fr)
        val mad = discMedian(fr.map(x => math.abs(x - med)))
        (g, vs(i)._2, med, mad,
          math.abs(vs(i)._3 - med) > 3.0 * mad)
      }
    }.sortBy(r => (r._1, r._2))
    assert(out === expect)
  }

  test("rollingRobust drops null values before framing") {
    val df = Seq(("g", 1L, Some(1.0)), ("g", 2L, None), ("g", 3L, Some(3.0)))
      .toDF("g", "t", "v")
    val out = Robust.rollingRobust(df, col("g"), col("t"), col("v"),
        frame = 2)
      .select(col("t"), col("roll_med"))
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    // the null row vanishes; t=3's frame is {1.0, 3.0} → ranked ⌈2/2⌉=1st
    assert(out === Seq((1L, 1.0), (3L, 1.0)))
  }

  test("rollingRobust frame=1 gives med=v, mad=0, no anomalies") {
    val df = Seq(("g", 1L, 4.0), ("g", 2L, -9.0)).toDF("g", "t", "v")
    val out = Robust.rollingRobust(df, col("g"), col("t"), col("v"),
        frame = 1)
      .select(col("v"), col("roll_med"), col("roll_mad"), col("is_anomaly"))
      .as[(Double, Double, Double, Boolean)].collect().toSeq
    out.foreach { case (v, med, mad, anom) =>
      assert(med === v); assert(mad === 0.0); assert(!anom)
    }
  }
}
