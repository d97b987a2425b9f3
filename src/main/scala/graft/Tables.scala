package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * One parquet file per table under `\$dir/` — TPC-H-ish star schema plus
  * `events` (time-series stand-in for the reference's OHLCV stream),
  * `documents` and `embeddings` (LLM-pipeline operator fixtures).
  *
  * Plain `spark.read.parquet` keeps the scan fully Catalyst-managed:
  * column pruning and predicate pushdown reach the parquet reader, and
  * partition sizing follows `spark.sql.files.maxPartitionBytes`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` normalized to the engine-wide contract: an int64 of
    * epoch-NANOSECONDS — exact, total-ordered, and reproducible in the
    * DuckDB oracle as `epoch_us(ts) * 1000` / `epoch_us(ts)` after the
    * downstream `DIV 1000`. The fixture has shipped both parquet
    * physical types across rounds — TIMESTAMP(NANOS) (reads as int64
    * under `spark.sql.legacy.parquet.nanosAsLong`) and
    * TIMESTAMP(MICROS) (reads as a timestamp) — so the loader
    * dispatches on the resolved type instead of assuming one:
    * timestamps convert via `unix_micros` (µs-exact, then ×1000; the
    * NTZ→LTZ cast is the identity under the UTC session timezone the
    * entry boundary pins), int64 passes through. Callers needing a
    * real timestamp can `(ts / 1000).cast("timestamp")`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
