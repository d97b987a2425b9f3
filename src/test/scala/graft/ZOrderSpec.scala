package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Interleave goldens + the aligned-prefix span bound that makes
  * Z-order layouts min-max prunable.
  */
class ZOrderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def zkeys(pts: Seq[(Long, Long)], bits: Int): Seq[Long] =
    pts.toDF("x", "y")
      .select(ZOrder.zkey2(col("x"), col("y"), bits).as("z"))
      .as[Long].collect().toSeq

  test("interleave golden: x bits land even, y bits odd") {
    // x=5 (101), y=3 (011) → 1·2⁰ + 1·2¹ + 1·2³ + 1·2⁴ = 27
    assert(zkeys(Seq((5L, 3L)), 3) === Seq(27L))
    assert(zkeys(Seq((0L, 0L)), 8) === Seq(0L))
    // all-ones in both dims → all 2·bits bits set
    assert(zkeys(Seq((7L, 7L)), 3) === Seq(63L))
  }

  test("random keys round-trip through a Scala de-interleave") {
    val rnd = new scala.util.Random(53)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 12).toLong,
      rnd.nextInt(1 << 12).toLong))
    val out = zkeys(pts, 12)
    pts.zip(out).foreach { case ((x, y), z) =>
      val xb = (0 until 12).map(k => ((z >> (2 * k)) & 1L) << k).sum
      val yb = (0 until 12).map(k => ((z >> (2 * k + 1)) & 1L) << k).sum
      assert((xb, yb) === (x, y), s"round-trip of ($x,$y)")
    }
  }

  test("aligned buckets bound BOTH dimension spans (the pruning claim)") {
    val rnd = new scala.util.Random(59)
    val pts = Seq.fill(3000)((rnd.nextInt(256).toLong,
      rnd.nextInt(256).toLong))
    val prof = ZOrder.bucketProfile(pts.toDF("x", "y"), col("x"), col("y"),
        bits = 8, prefixBits = 3)
      .select("x_min", "x_max", "y_min", "y_max")
      .as[(Long, Long, Long, Long)].collect()
    // an aligned 3-bit-pair prefix pins the top 3 bits of each dim:
    // every bucket's span is < 2^(8−3) = 32 in BOTH dimensions
    prof.foreach { case (xmn, xmx, ymn, ymx) =>
      assert(xmx - xmn < 32, s"x span [$xmn,$xmx]")
      assert(ymx - ymn < 32, s"y span [$ymn,$ymx]")
    }
    // ...whereas the full domain span is 8× that: the layout is the
    // only reason the bound holds
    assert(pts.map(_._1).max - pts.map(_._1).min >= 200)
  }

  test("zkey2Sql mirrors the column expression") {
    val rnd = new scala.util.Random(61)
    val pts = Seq.fill(50)((rnd.nextInt(1 << 10).toLong,
      rnd.nextInt(1 << 10).toLong))
    val viaSql = pts.toDF("x", "y")
      .selectExpr(s"${ZOrder.zkey2Sql("x", "y", 10)} AS z")
      .as[Long].collect().toSeq
    assert(viaSql === zkeys(pts, 10))
  }
}
