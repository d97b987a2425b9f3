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
}
