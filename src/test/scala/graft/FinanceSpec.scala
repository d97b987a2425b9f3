package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Finance

/** Hand-computed goldens for drawdown and TWAP. */
class FinanceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def series(rows: Seq[(Long, Double)], symbol: String = "A") =
    rows.map { case (t, c) => (symbol, t, c) }.toDF("symbol", "ts", "close")

  test("drawdown: peak tracking, trough, underwater count") {
    // peaks: 10,12,12,12,15,15; dd: 0, 0, -2/12, -4/12, 0, -3/15
    val s = series(Seq(0L -> 10.0, 1L -> 12.0, 2L -> 10.0, 3L -> 8.0,
      4L -> 15.0, 5L -> 12.0))
    val out = Finance.drawdownProfile(s, col("symbol"), col("ts"),
        col("close"))
      .select("max_drawdown", "trough_ts", "n_underwater", "n")
      .as[(Double, Long, Long, Long)].collect().toSeq
    assert(out === Seq(((8.0 - 12.0) / 12.0, 3L, 3L, 6L)))
  }

  test("drawdown: monotone rise has zero drawdown, trough at first row") {
    val s = series((0L to 4L).map(i => i -> (10.0 + i)))
    val out = Finance.drawdownProfile(s, col("symbol"), col("ts"),
        col("close"))
      .select("max_drawdown", "trough_ts", "n_underwater")
      .as[(Double, Long, Long)].collect().toSeq
    assert(out === Seq((0.0, 0L, 0L)))
  }

  test("drawdown: trough_ts is the EARLIEST row attaining the minimum") {
    // two equal troughs at ts 2 and 4
    val s = series(Seq(0L -> 10.0, 1L -> 8.0, 2L -> 5.0, 3L -> 9.0,
      4L -> 5.0))
    val out = Finance.drawdownProfile(s, col("symbol"), col("ts"),
        col("close"))
      .select("trough_ts").as[Long].collect().toSeq
    assert(out === Seq(2L))
  }

  test("twap: interval weighting, last row excluded, exact value") {
    // intervals: [0,10) close 2.00, [10,40) close 4.00 → units 200, 400
    // twap = (200*10 + 400*30) / (40 * 100) = 14000/4000 = 3.5
    val s = series(Seq(0L -> 2.0, 10L -> 4.0, 40L -> 99.0))
    val out = Finance.twap(s, col("symbol"), col("ts"), col("close"))
      .select("twap", "span_us", "n_intervals")
      .as[(Double, Long, Long)].collect().toSeq
    assert(out === Seq((3.5, 40L, 2L)))
  }

  test("twap: a single observation yields no intervals (empty output)") {
    val s = series(Seq(0L -> 5.0))
    assert(Finance.twap(s, col("symbol"), col("ts"), col("close"))
      .count() === 0L)
  }

  test("twap equals plain mean when intervals are equal") {
    val s = series(Seq(0L -> 1.11, 10L -> 2.22, 20L -> 3.33, 30L -> 7.0))
    val out = Finance.twap(s, col("symbol"), col("ts"), col("close"))
      .select("twap").as[Double].collect().head
    assert(out === (111.0 + 222.0 + 333.0) / 300.0)
  }

  test("seasonal profile: integer dow, exact means, zero-sum deviations") {
    val us = 86400000000L // one day in µs
    // epoch day 0 = Thu; day 4 = Mon → dow (4+3)%7 = 0. Two Mondays
    // (days 4, 11), one Tuesday (day 5).
    val s = series(Seq(4 * us -> 10.0, 11 * us -> 20.0, 5 * us -> 40.0))
    val out = graft.operators.Finance.seasonalProfile(s, col("symbol"),
        col("ts"), col("close"))
      .select(col("dow"), col("n"), col("dow_mean"), col("dev"))
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val overall = (1000L + 2000L + 4000L).toDouble / (3.0 * 100.0)
    assert(out === Seq(
      (0L, 2L, 15.0, 15.0 - overall),
      (1L, 1L, 40.0, 40.0 - overall)))
    // count-weighted deviations cancel
    val wsum = out.map { case (_, n, _, dev) => n * dev }.sum
    assert(math.abs(wsum) < 1e-9)
  }

  test("symbols stay independent") {
    val two = series(Seq(0L -> 10.0, 1L -> 5.0), "A")
      .union(series(Seq(0L -> 10.0, 1L -> 20.0), "B"))
    val out = Finance.drawdownProfile(two, col("symbol"), col("ts"),
        col("close"))
      .select("_sym", "max_drawdown")
      .as[(String, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq(("A", -0.5), ("B", 0.0)))
  }

  private def ticks(rows: Seq[(Long, Double, Long)], symbol: String = "A") =
    rows.map { case (t, c, v) => (symbol, t, c, v) }
      .toDF("symbol", "tsu", "close", "vol")

  test("ohlcResample: open/close by time, high/low by value, vol summed") {
    // bucket 0 (ts 0-9): ticks at 3,1,7 → open=tick@1, close=tick@7
    val t = ticks(Seq((3L, 5.0, 10L), (1L, 9.0, 20L), (7L, 2.0, 30L),
      (12L, 4.0, 5L)))
    val out = Finance.ohlcResample(t, col("symbol"), col("tsu"),
        col("close"), col("vol"), 10L)
      .select("bucket_ts", "open", "high", "low", "close", "volume",
        "n_ticks")
      .as[(Long, Double, Double, Double, Double, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (0L, 9.0, 9.0, 2.0, 2.0, 60L, 3L),
      (10L, 4.0, 4.0, 4.0, 4.0, 5L, 1L)))
  }

  test("ohlcResample: duplicate-timestamp ties resolve deterministically") {
    // Two ticks share tsu=1: min_by/max_by on the timestamp ALONE
    // would break the tie by arrival order (partition-dependent); the
    // (tsu, close) struct key pins open to the smaller and close to
    // the larger price, invariant under partitioning.
    val t = ticks(Seq((1L, 9.0, 1L), (1L, 3.0, 1L), (5L, 6.0, 1L),
      (9L, 8.0, 1L), (9L, 2.0, 1L)))
    def run(df: org.apache.spark.sql.DataFrame) =
      Finance.ohlcResample(df, col("symbol"), col("tsu"), col("close"),
          col("vol"), 10L)
        .select("open", "close").as[(Double, Double)].collect().toSeq
    val parts = (1 to 6).map(p => run(t.repartition(p)))
    assert(parts.forall(_ === Seq((3.0, 8.0))))
  }

  test("ohlcResample: result invariant under input partitioning") {
    val t = ticks((0L until 100L).map(i =>
      (i, ((i * 37) % 101).toDouble, (i % 7) + 1)))
    def run(df: org.apache.spark.sql.DataFrame) =
      Finance.ohlcResample(df, col("symbol"), col("tsu"), col("close"),
          col("vol"), 13L)
        .orderBy("bucket_ts").collect().toSeq
    assert(run(t.repartition(17)) === run(t.coalesce(1)))
  }

  test("cusum: clamp resets, drift accumulates, alarm crosses h") {
    // closes 10,10,14,14,14,6 → mean = 68/6 = 11.333…
    // cp: max(0,-1.33)=0, 0, 2.67, 5.33, 8.0, max(0, 8-5.33)=2.67
    // cn: 1.33, 2.67, 0, 0, 0, 5.33
    val mu = 68.0 / (6.0 * 1.0) // scale 0 → factor 1.0, integral closes
    val s = series(Seq(0L -> 10.0, 1L -> 10.0, 2L -> 14.0, 3L -> 14.0,
      4L -> 14.0, 5L -> 6.0))
    val out = Finance.cusumChart(s, col("symbol"), col("ts"),
        col("close"), h = 5.0, scale = 0)
      .select("_ts", "cusum_pos", "cusum_neg", "alarm")
      .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1).toSeq
    var cp = 0.0; var cn = 0.0
    val expect = Seq(10.0, 10.0, 14.0, 14.0, 14.0, 6.0).zipWithIndex.map {
      case (x, i) =>
        cp = math.max(0.0, cp + (x - mu)); cn = math.max(0.0, cn + (mu - x))
        (i.toLong, cp, cn, cp > 5.0 || cn > 5.0)
    }
    assert(out === expect)
    // cp crosses h=5 at i=3 (2.67+2.67=5.33) and stays elevated
    assert(out.map(_._4) === Seq(false, false, false, true, true, true))
  }

  test("cusum: NULL closes are dropped, not carried (explicit contract)") {
    // DuckDB's greatest() ignores NULL (resets the recursion to 0)
    // while the Cusum window carries state through it — cusumChart
    // filters NULLs up front so both engines see the same series.
    val withNull = Seq(("A", 0L, java.lang.Double.valueOf(10.0)),
      ("A", 1L, null.asInstanceOf[java.lang.Double]),
      ("A", 2L, java.lang.Double.valueOf(14.0)))
      .toDF("symbol", "ts", "close")
    val out = Finance.cusumChart(withNull, col("symbol"), col("ts"),
        col("close"), h = 5.0, scale = 0)
      .select("_ts", "cusum_pos").as[(Long, Double)]
      .collect().sortBy(_._1).toSeq
    // mean over the two NON-NULL closes = 12; the null row is absent
    assert(out === Seq((0L, 0.0), (2L, 2.0)))
  }

  test("cusum: repartition-invariant") {
    val s = series((0L until 200L).map(i => i -> ((i * 13 % 97) / 2.0)))
    def run(df: org.apache.spark.sql.DataFrame) =
      Finance.cusumChart(df, col("symbol"), col("ts"), col("close"), 20.0)
        .orderBy("_ts").collect().toSeq
    assert(run(s.repartition(11)) === run(s.coalesce(1)))
  }

  test("vwap: decimal-exact weighting, zero-volume bucket is NULL") {
    // bucket 0: (10.00 × 2) + (20.00 × 1) / 3 = 13.333... exact double
    // division of integers 4000/300; bucket 1: all-zero volume → NULL
    val t = ticks(Seq((0L, 10.0, 2L), (5L, 20.0, 1L), (12L, 50.0, 0L)))
    val out = Finance.vwap(t, col("symbol"), col("tsu"), col("close"),
        col("vol"), 10L)
      .select("bucket_ts", "vwap", "volume", "n_ticks")
      .as[(Long, Option[Double], Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (0L, Some(4000.0 / 300.0), 3L, 2L),
      (10L, None, 0L, 1L)))
  }
}
