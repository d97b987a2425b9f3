package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the spark.sql.extensions registration path end-to-end. */
object ExtDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Seq(("A", 0L, 10.0), ("A", 1L, 13.0)).toDF("symbol", "ts", "close")
      .createOrReplaceTempView("bars")
    spark.sql(
      """SELECT symbol, ts,
        |  ema(close, 0.5D) OVER (PARTITION BY symbol ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ema,
        |  simhash(split('a b c', ' ')) AS sh
        |FROM bars ORDER BY ts""".stripMargin).show()
    spark.stop()
  }
}
