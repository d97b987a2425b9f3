package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Ema
import graft.operators.Indicators

/** Golden + fold-equivalence specs for the custom EMA window function
  * (pandas ewm(span, adjust=False) semantics, Q4 —
  * /root/reference/spark/stock_analysis.py:186-190).
  */
class EmaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference fold: e_0 = x_0; e_t = a*x_t + (1-a)*e_{t-1} — exactly
    * the operand order of the Catalyst update expression.
    */
  private def emaFold(xs: Seq[Double], span: Int): Seq[Double] = {
    val a = Ema.alphaForSpan(span)
    xs.tail.scanLeft(xs.head)((e, x) => a * x + (1.0 - a) * e)
  }

  private def emaSpark(xs: Seq[Double], span: Int): Seq[Double] = {
    val df = xs.zipWithIndex.map { case (x, i) => ("A", i.toLong, x) }
      .toDF("symbol", "ts", "close")
    df.withColumn("ema",
        Ema.emaSpan(col("close"), span, Seq(col("symbol")), Seq(col("ts"))))
      .orderBy("ts").select("ema").as[Double].collect().toSeq
  }

  test("seed and first recursion step (hand-computed, span 12)") {
    // e_0 = 10.0; e_1 = (2/13)*11 + (11/13)*10 = 10.153846...
    val out = emaSpark(Seq(10.0, 11.0), 12)
    assert(out(0) === 10.0)
    assert(out(1) === (2.0 / 13.0) * 11.0 + (11.0 / 13.0) * 10.0)
  }

  test("bit-exact vs reference fold on a deterministic random series") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(200)(50.0 + rnd.nextGaussian() * 5.0)
    for (span <- Seq(9, 12, 26))
      assert(emaSpark(xs, span) === emaFold(xs, span))
  }

  test("multiple symbols recurse independently") {
    val df = (Seq.tabulate(50)(i => ("A", i.toLong, i.toDouble)) ++
      Seq.tabulate(50)(i => ("B", i.toLong, 100.0 - i)))
      .toDF("symbol", "ts", "close")
    val out = df.withColumn("ema",
        Ema.emaSpan(col("close"), 12, Seq(col("symbol")), Seq(col("ts"))))
      .orderBy("symbol", "ts").select("symbol", "ema").as[(String, Double)]
      .collect()
    val a = out.filter(_._1 == "A").map(_._2).toSeq
    val b = out.filter(_._1 == "B").map(_._2).toSeq
    assert(a === emaFold((0 until 50).map(_.toDouble), 12))
    assert(b === emaFold((0 until 50).map(i => 100.0 - i), 12))
  }

  test("null input carries the running value forward (defensive branch)") {
    val df = Seq(("A", 0L, Some(10.0)), ("A", 1L, None), ("A", 2L, Some(16.0)))
      .toDF("symbol", "ts", "close")
    val out = df.withColumn("ema",
        Ema.emaSpan(col("close"), 3, Seq(col("symbol")), Seq(col("ts"))))
      .orderBy("ts").select("ema").collect()
    val a = Ema.alphaForSpan(3)
    assert(out(0).getDouble(0) === 10.0)
    assert(out(1).getDouble(0) === 10.0) // null x leaves e unchanged
    assert(out(2).getDouble(0) === a * 16.0 + (1 - a) * 10.0)
  }

  test("MACD line/signal/histogram are consistent with the folds") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(120)(100.0 + rnd.nextGaussian() * 3.0)
    val out = Indicators.addMacd(
        xs.zipWithIndex.map { case (x, i) => ("A", i.toLong, x) }
          .toDF("symbol", "ts", "close"),
        col("symbol"), Seq(col("ts")), col("close"))
      .orderBy("ts").select("macd_line", "macd_signal", "macd_histogram")
      .as[(Double, Double, Double)].collect()
    val line = emaFold(xs, 12).zip(emaFold(xs, 26)).map { case (x, y) => x - y }
    val sig = emaFold(line, 9)
    assert(out.map(_._1).toSeq === line)
    assert(out.map(_._2).toSeq === sig)
    assert(out.forall { case (l, s, h) => h == l - s })
  }
}
