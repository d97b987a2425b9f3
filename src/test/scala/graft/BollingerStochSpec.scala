package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Indicators

/** Hand-computed specs for the Bollinger-band and stochastic-oscillator
  * stages: exact (bit-level) agreement with a plain-Scala fold that
  * performs the SAME left-associated IEEE operations, plus the
  * min_periods and degenerate-window contracts.
  */
class BollingerStochSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def series(xs: Seq[Double], symbol: String = "A") =
    xs.zipWithIndex.map { case (x, i) => (symbol, i.toLong, x) }
      .toDF("symbol", "ts", "close")

  private val xs = Seq(10.0, 11.5, 10.8, 12.1, 11.9, 12.5, 11.2, 13.0,
    12.7, 12.2)

  // Plain-Scala twin of addBollinger(n): left-assoc mean, left-assoc
  // squared-deviation sum, / (n-1), sqrt — identical operation order.
  private def bollBrute(s: Seq[Double], n: Int, i: Int)
      : Option[(Double, Double)] =
    if (i < n - 1) None
    else {
      val frame = s.slice(i - n + 1, i + 1)
      val mid = frame.reduceLeft(_ + _) / n.toDouble
      val varN = frame.map(x => (x - mid) * (x - mid))
        .reduceLeft(_ + _) / (n - 1).toDouble
      Some((mid, math.sqrt(varN)))
    }

  test("bollinger: null until the frame fills, then bit-exact vs brute") {
    val out = Indicators.addBollinger(series(xs), col("symbol"),
        Seq(col("ts")), col("close"), n = 5, width = 2.0)
      .orderBy("ts")
      .select("bb_mid", "bb_sd", "bb_upper", "bb_lower").collect()
    xs.indices.foreach { i =>
      bollBrute(xs, 5, i) match {
        case None =>
          assert((0 to 3).forall(out(i).isNullAt), s"row $i should be null")
        case Some((mid, sd)) =>
          assert(out(i).getDouble(0) === mid, s"mid at $i")
          assert(out(i).getDouble(1) === sd, s"sd at $i")
          assert(out(i).getDouble(2) === mid + 2.0 * sd, s"upper at $i")
          assert(out(i).getDouble(3) === mid - 2.0 * sd, s"lower at $i")
      }
    }
  }

  test("bollinger: constant series has sd 0 and null pct_b") {
    val out = Indicators.addBollinger(series(Seq.fill(6)(7.5)),
        col("symbol"), Seq(col("ts")), col("close"), n = 4)
      .orderBy("ts").select("bb_sd", "pct_b").collect()
    assert(out.drop(3).forall(r => r.getDouble(0) === 0.0 && r.isNullAt(1)))
  }

  test("bollinger: pct_b is 1 at the upper band, 0 at the lower") {
    val out = Indicators.addBollinger(series(xs), col("symbol"),
        Seq(col("ts")), col("close"), n = 5)
      .orderBy("ts")
      .select("close", "bb_lower", "bb_upper", "pct_b").collect()
      .drop(4)
    out.foreach { r =>
      val expect = (r.getDouble(0) - r.getDouble(1)) /
        (r.getDouble(2) - r.getDouble(1))
      assert(r.getDouble(3) === expect)
    }
  }

  test("stochastic: min_periods gate, exact %K, flat-window 0") {
    val s = Seq(5.0, 4.0, 6.0, 6.0, 6.0, 6.0, 3.0, 7.0)
    val out = Indicators.addStochastic(series(s), col("symbol"),
        Seq(col("ts")), col("close"), n = 3, dPeriod = 2)
      .orderBy("ts").select("stoch_k").collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0)) // partial frames
    // frame [5,4,6]: 100*(6-4)/(6-4) = 100
    assert(out(2).getDouble(0) === 100.0)
    // frame [4,6,6]: 100*(6-4)/(6-4) = 100
    assert(out(3).getDouble(0) === 100.0)
    // frame [6,6,6]: flat => 0 by contract
    assert(out(4).getDouble(0) === 0.0)
    // frame [6,3,7]: 100*(7-3)/(7-3)... close=3 at i=6: frame [6,6,3]
    assert(out(6).getDouble(0) === 100.0 * (3.0 - 3.0) / (6.0 - 3.0))
    assert(out(7).getDouble(0) === 100.0 * (7.0 - 3.0) / (7.0 - 3.0))
  }

  test("stochastic: %D is the left-assoc SMA of %K and nulls with it") {
    val s = Seq(5.0, 4.0, 6.0, 8.0, 7.0, 9.0)
    val rows = Indicators.addStochastic(series(s), col("symbol"),
        Seq(col("ts")), col("close"), n = 3, dPeriod = 2)
      .orderBy("ts").select("stoch_k", "stoch_d").collect()
    val k = rows.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    rows.indices.foreach { i =>
      val expect = for { a <- if (i >= 1) k(i - 1) else None; b <- k(i) }
        yield (a + b) / 2.0
      val got = if (rows(i).isNullAt(1)) None else Some(rows(i).getDouble(1))
      assert(got === expect, s"%D at $i")
    }
  }

  test("both stages keep symbols independent") {
    val two = series(xs, "A").union(series(xs.map(_ * 2.0), "B"))
    val boll = Indicators.addBollinger(two, col("symbol"), Seq(col("ts")),
      col("close"), n = 5)
    val out = Indicators.addStochastic(boll, col("symbol"), Seq(col("ts")),
        col("close"), n = 3, dPeriod = 2)
      .filter(col("symbol") === "B").orderBy("ts")
      .select("bb_mid", "stoch_k").collect()
    val (mid, _) = bollBrute(xs.map(_ * 2.0), 5, 4).get
    assert(out(4).getDouble(0) === mid)
    assert(out(2).getDouble(1) === 100.0 *
      (21.6 - 20.0) / (23.0 - 20.0))
  }
}
