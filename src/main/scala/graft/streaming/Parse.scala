package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's ingest decode path, as a reusable stateless stage:
  * Kafka `value` bytes → CAST AS STRING → `from_json(history schema)` →
  * `data.*` → `explode(historical_data)` → field projection →
  * `to_timestamp`/`date_format` derivations
  * (/root/reference/spark/stock_analysis.py:27-40, 57-84).
  *
  * Stateless narrow transforms only — usable identically on a batch
  * DataFrame and a streaming one (the streaming tests and the batch
  * roundtrip oracle query share this exact code). At scale this runs
  * embedded in the source stage (no shuffle); Catalyst's
  * OptimizeJsonExprs prunes unparsed fields out of `from_json`.
  */
object Parse {

  /** One historical OHLCV bar — stock_analysis.py:29-36. */
  val barSchema: StructType = StructType(Seq(
    StructField("time", StringType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", DoubleType)))

  /** The per-symbol history document — stock_analysis.py:27-40. */
  val historySchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("current_price", DoubleType),
    StructField("historical_data", ArrayType(barSchema))))

  /** `value` (bytes or string) → one row per bar with parsed time
    * columns. Output: symbol, current_price, time, open, high, low,
    * close, volume, timestamp, date_str.
    */
  def parse(raw: DataFrame): DataFrame =
    raw.select(col("value").cast("string").as("json_data"))        // P1/F1
      .select(from_json(col("json_data"), historySchema).as("data")) // P2/F2
      .select(col("data.*"))                                       // P3
      .select(col("symbol"), col("current_price"),
        explode(col("historical_data")).as("history"))             // F3
      .select(                                                     // P4
        col("symbol"),
        col("current_price"),
        col("history.time").as("time"),
        col("history.open").as("open"),
        col("history.high").as("high"),
        col("history.low").as("low"),
        col("history.close").as("close"),
        col("history.volume").as("volume"))
      .withColumn("timestamp", to_timestamp(col("time"), "yyyy-MM-dd")) // P5/F4
      .withColumn("date_str", date_format(col("timestamp"), "yyyy-MM-dd")) // F5
}
