package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PowerIteration

/** Brute-force replication + convergence sanity for the integer-exact
  * power iteration.
  */
class PowerIterationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Bit-exact reference of PowerIteration.iterate in driver BigInt. */
  private def brute(data: Seq[Array[Double]], iters: Int,
      s1: Long = 1000000L, s2: Long = 100000L): Array[Long] = {
    val dim = data.head.length
    val q = data.map(_.map(x => math.floor(x * s1 + 0.5).toLong))
    var v = Array.fill(dim)(s2)
    for (_ <- 1 to iters) {
      val d = q.map(row => row.indices.map(j => row(j) * v(j)).sum)
      val w = Array.tabulate(dim)(j =>
        q.indices.map(i => BigInt(q(i)(j)) * d(i)).sum)
      val wm = w.map(_.abs).max
      v = w.map(wj =>
        if (wm == 0) 0L else (wj.signum * ((wj.abs * s2) / wm)).toLong)
    }
    v
  }

  private def toDf(data: Seq[Array[Double]]) =
    data.zipWithIndex.map { case (a, i) => (i.toLong, a.map(_.toFloat)) }
      .toDF("id", "vec")

  test("topComponent matches the BigInt brute force on random vectors") {
    val rnd = new scala.util.Random(41)
    val data = Seq.fill(120)(Array.fill(8)(rnd.nextDouble() * 0.6 - 0.3))
    val out = PowerIteration.topComponent(toDf(data), col("id"), col("vec"),
        iters = 4)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(out.toSeq === brute(data, 4).toSeq)
  }

  test("project matches the brute-force integer dots") {
    val rnd = new scala.util.Random(43)
    val data = Seq.fill(50)(Array.fill(6)(rnd.nextDouble() - 0.5))
    val v = brute(data, 3)
    val expect = data.zipWithIndex.map { case (a, i) =>
      val q = a.map(x => math.floor(x * 1000000L + 0.5).toLong)
      (i.toLong, q.indices.map(j => q(j) * v(j)).sum)
    }
    val out = PowerIteration.project(toDf(data), col("id"), col("vec"),
        iters = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === expect)
  }

  test("a planted dominant direction is recovered") {
    val rnd = new scala.util.Random(47)
    val dim = 16
    val u = {
      val raw = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    // strong component along u + weak isotropic noise → big gap
    val data = Seq.fill(200) {
      val a = (rnd.nextGaussian() * 0.8)
      Array.tabulate(dim)(j => a * u(j) + rnd.nextGaussian() * 0.02)
    }
    val v = PowerIteration.topComponent(toDf(data), col("id"), col("vec"),
        iters = 6)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2.toDouble)
    val vn = math.sqrt(v.map(x => x * x).sum)
    val cos = math.abs(v.indices.map(j => v(j) / vn * u(j)).sum)
    assert(cos > 0.99, s"cosine with planted direction was $cos")
  }

  test("an all-zero corpus hits the wm=0 guard and yields the zero vector") {
    val data = Seq.fill(10)(Array.fill(4)(0.0))
    val out = PowerIteration.topComponent(toDf(data), col("id"), col("vec"),
        iters = 2)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(out.toSeq === Seq.fill(4)(0L))
  }
}
