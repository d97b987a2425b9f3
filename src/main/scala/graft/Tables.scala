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
  /** `events.ts` is a parquet TIMESTAMP(NANOS) column, which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]) unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` is set, in which case it
    * reads as an int64 of epoch-nanoseconds — exact, total-ordered, and
    * reproducible in the DuckDB oracle as `epoch_ns(ts)`. Callers needing
    * a real timestamp can `(ts / 1000).cast("timestamp")` (µs precision).
    *
    * The conf is REQUIRED and must be set at session construction (see
    * `Sessions.configure` / `SparkEntry.bars`) — this loader deliberately
    * does not mutate session state.
    */
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
