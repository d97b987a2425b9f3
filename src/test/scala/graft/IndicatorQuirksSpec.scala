package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Indicators

/** Hand-computed specs for the reference's pandas quirks Q1-Q6
  * (SURVEY.md §2.9, /root/reference/spark/stock_analysis.py:173-224).
  */
class IndicatorQuirksSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def series(xs: Seq[Double], symbol: String = "A") =
    xs.zipWithIndex.map { case (x, i) => (symbol, i.toLong, x) }
      .toDF("symbol", "ts", "close")

  private def rsiOf(xs: Seq[Double]): Seq[Option[Double]] =
    Indicators.addRsi(series(xs), col("symbol"), Seq(col("ts")), col("close"))
      .orderBy("ts").select("rsi").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  // Q2: pandas rolling(5).mean() min_periods => null until 5 rows.
  test("Q2: MA5 is null for the first 4 rows, exact mean after") {
    val out = Indicators.addMa(series(Seq(1, 2, 3, 4, 5, 6).map(_.toDouble)),
        col("symbol"), Seq(col("ts")), col("close"))
      .orderBy("ts").select("ma5").collect()
    assert(out.take(4).forall(_.isNullAt(0)))
    assert(out(4).getDouble(0) === 3.0) // (1+2+3+4+5)/5
    assert(out(5).getDouble(0) === 4.0) // (2+3+4+5+6)/5
  }

  test("Q2: a 4-row series has MA5 entirely null") {
    val out = Indicators.addMa(series(Seq(1.0, 2.0, 3.0, 4.0)),
        col("symbol"), Seq(col("ts")), col("close"))
      .select("ma5").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  // Q1: monotone rise => avg_loss == 0 => rs = 0 => RSI = 0 (reference
  // quirk; textbook RSI would be 100) — stock_analysis.py:182.
  test("Q1: RSI on a monotone rise is 0, not 100") {
    val rsi = rsiOf((1 to 20).map(_.toDouble))
    assert(rsi.take(13).forall(_.isEmpty)) // needs 14 rows of gains
    assert(rsi.drop(13).forall(_.contains(0.0)))
  }

  // Q1+Q3 on a mixed series: exact RSI vs a hand fold replicating
  // pandas diff/where/rolling semantics (first delta coerced to 0).
  test("Q3: exact RSI matches the pandas-semantics fold on a mixed series") {
    val xs = Seq(10.0, 11.0, 10.5, 10.7, 10.2, 10.9, 11.5, 11.2, 11.8,
      12.0, 11.6, 11.9, 12.4, 12.1, 12.6, 13.0)
    val d = xs.indices.map(i => if (i == 0) 0.0 else xs(i) - xs(i - 1))
    val gain = d.map(x => if (x > 0) x else 0.0)
    val loss = d.map(x => if (x < 0) -x else 0.0)
    def mean14(s: Seq[Double], i: Int): Option[Double] =
      if (i < 13) None
      // left-associated sum, same order as Indicators.rollingMean
      else Some(((i - 13) to i).map(s).reduceLeft(_ + _) / 14.0)
    val expected = xs.indices.map { i =>
      (mean14(gain, i), mean14(loss, i)) match {
        case (Some(g), Some(l)) =>
          val rs = if (l == 0.0) 0.0 else g / l
          Some(100.0 - (100.0 / (1.0 + rs)))
        case _ => None
      }
    }
    assert(rsiOf(xs) === expected)
  }

  // Q5: rows with null indicators fall through every when() to HOLD.
  test("Q5: early null-indicator rows get suggestion HOLD + neutral reason") {
    val out = Indicators.enrich(series((1 to 30).map(_.toDouble)),
        col("symbol"), Seq(col("ts")), col("close"))
      .orderBy("ts").select("suggestion", "reason").collect()
    // rows 0..18 have null ma20 => all conditions null => default
    assert(out.take(19).forall(r =>
      r.getString(0) == "HOLD" && r.getString(1) == Indicators.ReasonHold))
  }

  // Q6: first-match ordering + exact band edges of the when-chain,
  // driven directly through the decision stage (stage split makes the
  // decision layer testable in isolation).
  test("Q6: suggestion chain first-match semantics and band edges") {
    val rows = Seq(
      // (ma5, ma20, rsi, macd_line, macd_signal) -> expected
      (2.0, 1.0, 65.0, 1.0, 0.0, "BUY"),        // c1
      (2.0, 1.0, 70.0, 1.0, 0.0, "HOLD/SELL"),  // rsi=70 boundary: c1 fails (<70), c2 >=70
      (2.0, 1.0, 75.0, 0.0, 1.0, "HOLD/SELL"),  // c2 regardless of macd
      (1.0, 2.0, 30.0, 1.0, 0.0, "WATCH/BUY"),  // rsi=30 boundary: c3 <=30
      (1.0, 2.0, 25.0, 0.0, 1.0, "SELL/AVOID"), // c3 fails (macd<=signal), c4
      (1.0, 2.0, 50.0, 1.0, 0.0, "HOLD"),       // downtrend but macd>signal and rsi>30
      (1.0, 1.0, 50.0, 1.0, 0.0, "HOLD"),       // ma5==ma20: no trend either way
    )
    val df = rows.toDF("ma5", "ma20", "rsi", "macd_line", "macd_signal", "expected")
    val out = Indicators.addSuggestion(df).select("expected", "suggestion").collect()
    out.foreach { r => assert(r.getString(1) === r.getString(0)) }
  }

  test("Q6: null ma5 falls through to HOLD (np.select default)") {
    val df = Seq((Option.empty[Double], Option(1.0), Option(50.0), Option(1.0), Option(0.0)))
      .toDF("ma5", "ma20", "rsi", "macd_line", "macd_signal")
    val Row(s: String, r: String) =
      Indicators.addSuggestion(df).select("suggestion", "reason").head()
    assert(s === "HOLD" && r === Indicators.ReasonHold)
  }
}
