package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Sessions
import graft.streaming.{Parse, StreamingPipeline}

/** Scheduled-ingest demo — the engine-side equivalent of the
  * reference's orchestrated fetch-and-produce lifecycle
  * (fetch_to_kafka_dag.py:130-141: a PythonOperator on an
  * every-30-minutes cron schedule fetches per-symbol history documents
  * and produces them to Kafka, 5 symbols per batch).
  *
  * The REST fetcher itself is out of engine scope (SURVEY §2.1 S5), so
  * the "DAG" here is a deterministic feeder dropping one JSON batch
  * file per cadence tick into a watched directory. Everything engine-
  * side is real: a file-source stream with bounded per-trigger
  * consumption (the maxOffsetsPerTrigger analog), the Parse decode
  * stage, full indicator enrichment, Kafka-shaped (key, value) records,
  * and a directory sink standing in for the Kafka producer (the
  * spark-sql-kafka jar is absent from this container — build.sbt:8-12;
  * swapping the directory sink for StreamingPipeline.kafkaSink changes
  * one line).
  */
object IngestDemo {

  /** One per-symbol history document in the DAG's produced shape
    * (fetch_to_kafka_dag.py:96-101): symbol + current_price +
    * historical_data bars.
    */
  private[tools] def doc(symbol: String, base: Double, nBars: Int): String = {
    val hist = (0 until nBars).map { i =>
      val d = f"2024-01-${i + 1}%02d"
      val c = base + i * 0.5
      s"""{"time":"$d","open":$c,"high":$c,"low":$c,"close":$c,"volume":10.0}"""
    }.mkString("[", ",", "]")
    val cur = base + (nBars - 1) * 0.5
    s"""{"symbol":"$symbol","current_price":$cur,"historical_data":$hist}"""
  }

  /** Run `ticks` scheduled ingest rounds at `cadenceMs`; returns the
    * total Kafka-shaped records landed in the sink directory.
    */
  def run(spark: SparkSession, ticks: Int, cadenceMs: Long): Long = {
    val inDir: Path = Files.createTempDirectory("graft-ingest-in")
    val outDir = Files.createTempDirectory("graft-ingest-out")
      .resolve("records").toString
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString

    val raw = spark.readStream
      .option("maxFilesPerTrigger", 1) // bounded consumption per trigger
      .text(inDir.toString)
      .select(col("value"))

    val query = StreamingPipeline.start(Parse.parse(raw), ckpt,
        trigger = Trigger.ProcessingTime(cadenceMs),
        queryName = "graft-ingest-demo") { (records, batchId) =>
      records.write.mode("append").parquet(outDir)
      println(s"[ingest-demo] batch $batchId -> $outDir")
    }
    StreamingPipeline.stopOnShutdown(query)

    // the scheduler: one batch file per tick, 5 symbols per batch —
    // the DAG's symbol chunking (fetch_to_kafka_dag.py:58-61)
    val symbols = Vector("VNM", "FPT", "HPG", "VCB", "SSI",
      "MWG", "GAS", "VIC", "MSN", "PNJ")
    var t = 0
    while (t < ticks) {
      val off = (t * 5) % symbols.size
      val lines = symbols.slice(off, off + 5).zipWithIndex.map {
        case (sym, i) => doc(sym, 50.0 + 10 * i, nBars = 22)
      }
      Files.write(inDir.resolve(f"batch_$t%04d.json"),
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      Thread.sleep(cadenceMs)
      t += 1
    }
    query.processAllAvailable()
    query.stop()
    spark.read.parquet(outDir).count()
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.fromEnv()
    val n = run(spark, ticks = 3, cadenceMs = 1000L)
    println(s"INGEST_DEMO records=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
