package graft

import org.scalatest.funsuite.AnyFunSuite

/** The switcher's SQL-only path: the MACD pipeline written entirely in
  * `spark.sql` text (recursive EMAs via the registered `ema()` window
  * function, nested windows through a CTE) must be BIT-EQUAL to the
  * DataFrame operator path — same engine, same plan family, two
  * authoring surfaces.
  */
class SqlPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  GraftFunctions.register(spark)

  test("pure-SQL MACD == DSL MACD, bit for bit") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.bars(spark, dir).createOrReplaceTempView("bars_v")
    // alphas spelled as the same double divisions alphaForSpan computes
    val sql = spark.sql(
      """WITH m AS (
        |  SELECT symbol, ts,
        |    ema(close, 2.0D/13.0D) OVER w
        |      - ema(close, 2.0D/27.0D) OVER w AS macd_line
        |  FROM bars_v
        |  WINDOW w AS (PARTITION BY symbol ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT symbol, ts, macd_line,
        |  ema(macd_line, 2.0D/10.0D) OVER w2 AS macd_signal,
        |  macd_line - ema(macd_line, 2.0D/10.0D) OVER w2 AS macd_histogram
        |FROM m
        |WINDOW w2 AS (PARTITION BY symbol ORDER BY ts
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY symbol, ts""".stripMargin)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val dsl = SparkEntry.queries("q_ind_macd")(spark, dir)
      .select("symbol", "ts", "macd_line", "macd_signal", "macd_histogram")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(sql === dsl)
  }
}
