package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Indicators

/** The reference engine's streaming entry point, Spark-first
  * (/root/reference/spark/stock_analysis.py:43-54, 262-338):
  * Kafka source → [[Parse.parse]] → per-micro-batch indicator pipeline →
  * Kafka-shaped `(key, value)` records → sink, with processing-time
  * trigger, update output mode, checkpointing, bounded offsets per
  * trigger, restart-on-error, and a graceful-shutdown hook (T1-T7).
  *
  * The indicator math runs inside `foreachBatch` for exact reference
  * parity (its windows are batch-scoped — quirk Q7), but as a NATIVE
  * distributed window pipeline over the batch DataFrame — no driver
  * collect, no pandas. Executors compute everything; the driver only
  * coordinates offsets. At 100 TB/day the per-trigger work is bounded
  * by `maxOffsetsPerTrigger` and scales out with Kafka partitions
  * (one scan task per partition-range slice).
  */
object StreamingPipeline {

  /** The 17 output columns — stock_analysis.py:244-261. */
  val outputColumns: Seq[String] = Seq(
    "symbol", "current_price", "time", "open", "high", "low", "close",
    "volume", "date_str", "ma5", "ma20", "rsi",
    "macd_line", "macd_signal", "macd_histogram", "suggestion", "reason")

  /** Kafka streaming source with the reference's options
    * (stock_analysis.py:43-54). Not exercised in tests (no broker in
    * the container) — the transform chain is source-agnostic and tests
    * drive it from MemoryStream.
    */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
      topic: String, maxOffsetsPerTrigger: Long = 20000L): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)                           // S1
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger) // T5
      .option("failOnDataLoss", "false")                    // T6
      .load()

  /** Streaming exact dedup (extension E1 — fixes reference quirk Q8:
    * each DAG run re-sends full history and nothing dedups). Stateful
    * `dropDuplicatesWithinWatermark` on the natural key: state is
    * bounded by the watermark horizon, so it runs forever at any rate;
    * re-sent (symbol, time) bars inside the horizon are dropped.
    */
  def dedupStream(parsed: DataFrame, watermark: String = "24 hours"): DataFrame =
    parsed.withWatermark("timestamp", watermark)
      .dropDuplicatesWithinWatermark("symbol", "time")

  /** Watermarked event-time tumbling aggregation (extension E2 —
    * reference has NO stream-time semantics, SURVEY T8): per
    * (bucket, symbol) count/sum in APPEND mode. A window only emits
    * once the watermark passes its end, and rows arriving later than
    * the watermark are dropped — state is bounded by the watermark
    * horizon, so the query runs forever at any rate. Batch analogue
    * (same window() operator) is oracle-gated as q_window_tumbling.
    *
    * Input needs `event_time: timestamp`, `symbol`, `close`.
    */
  def windowedCounts(bars: DataFrame, watermark: String = "1 minute",
      bucket: String = "1 minute"): DataFrame =
    bars
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), bucket).as("w"), col("symbol"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("close") * 100).cast("long")).as("sum_cents"))
      .select(unix_micros(col("w.start")).as("bucket_us"), col("symbol"),
        col("cnt"), col("sum_cents"))

  /** Streaming OHLCV bar builder — the batch ohlcResample
    * (operators/Finance.scala) as a watermarked tumbling aggregation:
    * per (bucket, symbol) open/high/low/close via min_by/max_by on the
    * exact event time plus summed volume, emitted in APPEND mode once
    * the watermark passes the bucket end. min_by/max_by are full
    * partial aggregates (a (value, key) pair each), so streaming state
    * per open window is O(1) like any count — a tick stream at any
    * rate holds only watermark-horizon × |symbols| bar states.
    * StreamingSpec pins the emitted bars equal to the batch
    * ohlcResample of the same ticks — one semantics, two runtimes
    * (the same contract the indicator pipeline proves via
    * q_ind_stateful).
    *
    * Input needs `event_time: timestamp`, `symbol`, `close`, `vol`.
    */
  def streamingBars(ticks: DataFrame, watermark: String = "1 minute",
      bucket: String = "1 minute"): DataFrame =
    ticks
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), bucket).as("w"), col("symbol"))
      .agg(
        min_by(col("close"), col("event_time")).as("open"),
        max(col("close")).as("high"),
        min(col("close")).as("low"),
        max_by(col("close"), col("event_time")).as("close"),
        sum(col("vol")).as("volume"),
        count(lit(1)).as("n_ticks"))
      .select(unix_micros(col("w.start")).as("bucket_us"), col("symbol"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("n_ticks"))

  /** Stream-static broadcast enrichment (SURVEY §2.3's normalized
    * alternative to the reference's produce-time denormalization of
    * current_price into every message): join the stream against a
    * small static dimension. The dim is broadcast to every task — the
    * stream side never shuffles and no state is kept, so the join
    * works in append mode at any rate; Spark re-reads the static side
    * per micro-batch, picking up dim updates between triggers.
    */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Watermarked event-time SESSION window aggregation (gap-based —
    * the stateful merging window, unlike the arithmetic tumbling
    * bucket): events within `gap` of each other merge into one
    * session; a session closes and emits once the watermark passes
    * its end (last event + gap). State per key is one open session —
    * bounded regardless of stream lifetime. Batch analogue is
    * oracle-gated as q_window_session.
    */
  def sessionCounts(bars: DataFrame, watermark: String = "1 minute",
      gap: String = "1 minute"): DataFrame =
    bars
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap).as("w"), col("symbol"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("w.start")).as("session_start"),
        unix_micros(col("w.end")).as("session_end"), col("symbol"),
        col("cnt"))

  /** Watermarked stream-stream inner join (extension — the stateful
    * two-sided join the reference's single-topic pipeline never needs):
    * each left event pairs with right events of the same key whose
    * event time falls in [l_time − window, l_time]. Watermarks on BOTH
    * sides plus the two-sided time-range predicate let Spark evict
    * buffered rows once the watermark passes the range, so join state
    * is bounded by rate × (watermark + window) regardless of how long
    * the query runs — the property that makes the operator viable on
    * an unbounded 100 TB/day stream.
    *
    * Left needs (symbol, l_time, …), right needs (symbol_r, r_time, …).
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
      watermark: String = "1 minute", window: String = "1 minute"): DataFrame =
    left.withWatermark("l_time", watermark)
      .join(right.withWatermark("r_time", watermark),
        expr(s"symbol = symbol_r AND " +
          s"r_time >= l_time - INTERVAL $window AND r_time <= l_time"))

  /** Batch-scoped analytics (reference parity, Q7): enrich the parsed
    * bars of ONE micro-batch over (symbol, timestamp).
    */
  def enrichBatch(parsed: DataFrame): DataFrame =
    Indicators.enrich(parsed, col("symbol"),
      Seq(col("timestamp"), col("time")), col("close"))

  /** Kafka-shaped output records: key = symbol, value = to_json(struct
    * of the 17 output columns) — stock_analysis.py:262-283 (S2/F6).
    */
  def toKafkaRecords(enriched: DataFrame): DataFrame =
    enriched.select(
      col("symbol").cast("string").as("key"),
      to_json(struct(outputColumns.map(col): _*)).as("value"))

  /** Start the full pipeline: parsed stream → foreachBatch(enrich →
    * serialize → `sink`). The empty-batch guard (P10,
    * stock_analysis.py:101) short-circuits idle triggers.
    */
  def start(parsed: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 minutes"),
      queryName: String = "graft-indicators")(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    parsed.writeStream
      .queryName(queryName)
      .outputMode("update")                                 // T2
      .trigger(trigger)                                     // T1
      .option("checkpointLocation", checkpointDir)          // T4
      .foreachBatch { (batch: DataFrame, batchId: Long) =>  // T3
        if (!batch.isEmpty) {                               // P10
          sink(toKafkaRecords(enrichBatch(batch)), batchId)
        }
      }
      .start()

  /** Sink writing the (key, value) records to a Kafka topic —
    * stock_analysis.py:278-283. Usable as the `sink` argument of
    * [[start]].
    */
  def kafkaSink(bootstrapServers: String, topic: String)(
      records: DataFrame, batchId: Long): Unit =
    records.write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()

  /** Graceful shutdown (T7): stop the query on JVM termination —
    * stock_analysis.py:306-321.
    *
    * Registered through Spark's priority-ordered shutdown manager, NOT
    * `sys.addShutdownHook`: plain JVM hooks run concurrently with
    * Spark's own context-stop hook, so `query.stop()` raced the
    * context teardown and threw "Cannot call methods on a stopped
    * SparkContext" — the query was never actually stopped (caught by
    * ShutdownHookSpec's forked-JVM SIGTERM harness). A
    * before-context-stop priority makes the query stop strictly first.
    */
  def stopOnShutdown(query: StreamingQuery): Unit = {
    org.apache.spark.sql.graft.Bridge.addShutdownHook(
      org.apache.spark.sql.graft.Bridge.BeforeContextStopPriority) { () =>
      try {
        if (query.isActive) query.stop()
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft-streaming] shutdown stop failed: ${e.getMessage}")
      }
    }
    ()
  }

  /** Restart-on-error loop (T6): rebuild and re-await the query up to
    * `maxRestarts` times — stock_analysis.py:324-338. The checkpoint
    * makes restarts resume from committed offsets.
    */
  def awaitWithRestart(mkQuery: () => StreamingQuery,
      maxRestarts: Int = 1): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      try {
        mkQuery().awaitTermination()
        done = true
      } catch {
        case e: Throwable if attempts < maxRestarts =>
          attempts += 1
          System.err.println(
            s"[graft-streaming] query failed (${e.getMessage}); restart $attempts/$maxRestarts")
        case e: Throwable => throw e
      }
    }
  }
}
