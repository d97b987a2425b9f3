package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Parse, StreamingPipeline}

/** End-to-end structured-streaming specs: MemoryStream of history-doc
  * JSON → parse → foreachBatch indicator pipeline → Kafka-shaped
  * (key, value) records, with trigger + checkpoint — the reference's
  * whole entry point minus the broker (SURVEY §2.9 T1-T7).
  */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def doc(symbol: String, price: Double, bars: Seq[(String, Double)]): String = {
    val hist = bars.map { case (time, close) =>
      s"""{"time":"$time","open":${close - 0.5},"high":${close + 1.0},""" +
        s""""low":${close - 1.0},"close":$close,"volume":1000.0}"""
    }.mkString("[", ",", "]")
    s"""{"symbol":"$symbol","current_price":$price,"historical_data":$hist}"""
  }

  private val days = (1 to 25).map(i => f"2024-01-$i%02d")

  test("parse flattens a history doc with derived time columns") {
    val raw = Seq(doc("AAA", 12.5, days.take(3).map((_, 10.0)))).toDF("value")
    val out = Parse.parse(raw)
    assert(out.columns.toSeq === Seq("symbol", "current_price", "time",
      "open", "high", "low", "close", "volume", "timestamp", "date_str"))
    val rows = out.orderBy("time").collect()
    assert(rows.length === 3)
    assert(rows.head.getAs[String]("symbol") === "AAA")
    assert(rows.head.getAs[String]("date_str") === "2024-01-01")
    assert(rows.head.getAs[java.sql.Timestamp]("timestamp") != null)
  }

  test("malformed and schema-mismatched JSON null out, not crash") {
    val raw = Seq("not json at all", """{"unrelated": 1}""").toDF("value")
    val out = Parse.parse(raw).collect()
    assert(out.isEmpty) // explode of null array drops the rows
  }

  test("full streaming pipeline: MemoryStream → trigger+checkpoint → 17-col Kafka records") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString
    val collected = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

    val parsed = Parse.parse(stream.toDF().select(col("value")))
    val query = StreamingPipeline.start(parsed, checkpoint,
        trigger = Trigger.ProcessingTime(0L), queryName = "graft-test") {
      (records: DataFrame, _: Long) =>
        collected ++= records.as[(String, String)].collect()
    }
    try {
      stream.addData(
        doc("AAA", 12.5, days.map((_, 10.0))),
        doc("BBB", 99.0, days.zipWithIndex.map { case (d, i) => (d, 50.0 + i) }))
      query.processAllAvailable()
    } finally query.stop()

    assert(collected.map(_._1).toSet === Set("AAA", "BBB"))
    assert(collected.size === 50)

    // the serialized value must round-trip with the full 17-col schema
    val values = collected.map(_._2).toSeq.toDF("value")
    val ddl = "STRUCT<" + StreamingPipeline.outputColumns.map {
      case c @ ("symbol" | "time" | "date_str" | "suggestion" | "reason") => s"$c: STRING"
      case c => s"$c: DOUBLE"
    }.mkString(", ") + ">"
    val reparsed = values.select(
        from_json(col("value"),
          org.apache.spark.sql.types.DataType.fromDDL(ddl)).as("data"))
      .select(col("data.*"))
    assert(reparsed.columns.toSeq === StreamingPipeline.outputColumns)
    val bbb = reparsed.filter(col("symbol") === "BBB").orderBy("date_str")
    // monotone rise → RSI 0 from row 13 (quirk Q1), MA5 from row 4
    val rsis = bbb.select("rsi").collect()
    assert(rsis.take(13).forall(_.isNullAt(0)))
    assert(rsis.drop(13).forall(_.getDouble(0) == 0.0))
    val ma5 = bbb.select("ma5").collect()
    assert(ma5.take(4).forall(_.isNullAt(0)))
    assert(ma5(4).getDouble(0) === 52.0) // (50+51+52+53+54)/5
    // checkpoint actually materialized (T4)
    assert(new java.io.File(s"$checkpoint/offsets").list().nonEmpty)
  }

  test("empty-batch guard: idle trigger does not invoke the sink (P10)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val checkpoint = Files.createTempDirectory("graft-ckpt-empty").toString
    var invocations = 0
    val query = StreamingPipeline.start(
        Parse.parse(stream.toDF().select(col("value"))), checkpoint,
        trigger = Trigger.ProcessingTime(0L), queryName = "graft-empty") {
      (_: DataFrame, _: Long) => invocations += 1
    }
    try query.processAllAvailable()
    finally query.stop()
    assert(invocations === 0)
  }

  test("streaming dedup drops re-sent bars across micro-batches (E1/Q8)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val checkpoint = Files.createTempDirectory("graft-ckpt-dedup").toString
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val deduped = StreamingPipeline.dedupStream(
      Parse.parse(stream.toDF().select(col("value"))))
    val query = deduped.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        emitted += batch.count()
        ()
      }
      .start()
    try {
      stream.addData(doc("AAA", 10.0, days.take(5).map((_, 10.0))))
      query.processAllAvailable()
      // the reference's DAG re-sends the identical history every run
      stream.addData(doc("AAA", 10.0, days.take(5).map((_, 10.0))))
      query.processAllAvailable()
      stream.addData(doc("AAA", 10.0, days.slice(5, 7).map((_, 11.0))))
      query.processAllAvailable()
    } finally query.stop()
    val counts = emitted.filter(_ > 0)
    assert(counts.head === 5)            // first batch: all new
    assert(counts.sum === 7)             // resend contributed nothing
  }

  test("watermarked tumbling agg: windows close once, late data dropped (E2)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(String, Long, Double)]
    val checkpoint = Files.createTempDirectory("graft-ckpt-wagg").toString
    val min = 60L * 1000000L // 1 minute in µs
    val bars = stream.toDF().toDF("symbol", "us", "close")
      .withColumn("event_time", timestamp_micros(col("us")))
    val query = StreamingPipeline.windowedCounts(bars)
      .writeStream.format("memory").queryName("graft_wagg")
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      // two buckets' worth, out of order within the batch
      stream.addData(("AAA", min + 1, 2.0), ("AAA", 5L, 1.0), ("AAA", 10L, 4.0))
      query.processAllAvailable()
      // advance the watermark far past both buckets → they emit & close
      stream.addData(("AAA", 10 * min, 9.0))
      query.processAllAvailable()
      // a LATE row for the long-closed first bucket → must be dropped
      stream.addData(("AAA", 20L, 100.0))
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("graft_wagg")
      .select("bucket_us", "symbol", "cnt", "sum_cents")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out === Set(
      (0L, "AAA", 2L, 500L),        // 1.0 + 4.0 → 500 cents; late 100.0 absent
      (min, "AAA", 1L, 200L)))
  }

  test("streaming OHLCV bars equal the batch ohlcResample of the same ticks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(String, Long, Double, Long)]
    val checkpoint = Files.createTempDirectory("graft-ckpt-ohlc").toString
    val min = 60L * 1000000L
    val rows = Seq( // two symbols, two buckets, out of order in-batch
      ("AAA", 3L, 5.0, 10L), ("AAA", 1L, 9.0, 20L), ("AAA", 7L, 2.0, 30L),
      ("BBB", 2L, 1.0, 5L),
      ("AAA", min + 2, 4.0, 7L), ("BBB", min + 9, 8.0, 1L))
    val ticks = stream.toDF().toDF("symbol", "us", "close", "vol")
      .withColumn("event_time", timestamp_micros(col("us")))
    val query = StreamingPipeline.streamingBars(ticks)
      .writeStream.format("memory").queryName("graft_sbars")
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      stream.addData(rows: _*)
      query.processAllAvailable()
      stream.addData(("AAA", 10 * min, 1.0, 1L)) // advance watermark
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("graft_sbars")
      .select("bucket_us", "symbol", "open", "high", "low", "close",
        "volume", "n_ticks")
      .as[(Long, String, Double, Double, Double, Double, Long, Long)]
      .collect().toSet
    val batch = graft.operators.Finance.ohlcResample(
        rows.toDF("symbol", "tsu", "close", "vol"),
        col("symbol"), col("tsu"), col("close"), col("vol"), min)
      .select((col("bucket_ts")).as("bucket_us"), col("_sym").as("symbol"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("n_ticks"))
      .as[(Long, String, Double, Double, Double, Double, Long, Long)]
      .collect().toSet
    assert(streamed === batch)
    assert(streamed.size === 4)
  }

  test("Trigger.AvailableNow drains everything then terminates itself") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val checkpoint = Files.createTempDirectory("graft-ckpt-avail").toString
    val collected = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    stream.addData(doc("AAA", 10.0, days.take(3).map((_, 10.0))))
    stream.addData(doc("BBB", 20.0, days.take(2).map((_, 20.0))))

    val parsed = Parse.parse(stream.toDF().select(col("value")))
    val query = StreamingPipeline.start(parsed, checkpoint,
        trigger = Trigger.AvailableNow(), queryName = "graft-availnow") {
      (records: DataFrame, _: Long) =>
        collected ++= records.as[(String, String)].collect()
    }
    // AvailableNow = incremental-batch mode: processes ALL available
    // input (respecting per-trigger limits across multiple batches),
    // then stops the query on its own — no manual stop().
    assert(query.awaitTermination(60000), "query should self-terminate")
    assert(!query.isActive)
    assert(collected.map(_._1).toSet === Set("AAA", "BBB"))
    assert(collected.size === 5) // 3 + 2 bars
  }

  test("stream-static broadcast join enriches without shuffling the stream") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Double)]
    val checkpoint = Files.createTempDirectory("graft-ckpt-dim").toString
    val dim = Seq(("AAA", "tech"), ("BBB", "energy")).toDF("symbol", "sector")
    val bars = stream.toDF().toDF("symbol", "close")
    val query = StreamingPipeline.enrichWithStatic(bars, dim, "symbol")
      .writeStream.format("memory").queryName("graft_dimjoin")
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      stream.addData(("AAA", 1.0), ("CCC", 2.0))
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("graft_dimjoin")
      .select("symbol", "close", "sector")
      .as[(String, Double, Option[String])].collect().toSet
    // left join: unmatched stream rows survive with a null sector
    assert(out === Set(("AAA", 1.0, Some("tech")), ("CCC", 2.0, None)))
  }

  test("session windows merge within gap, close after watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val checkpoint = Files.createTempDirectory("graft-ckpt-sess").toString
    val min = 60L * 1000000L // 1 minute in µs
    val bars = stream.toDF().toDF("symbol", "us")
      .withColumn("event_time", timestamp_micros(col("us")))
    val query = StreamingPipeline.sessionCounts(bars)
      .writeStream.format("memory").queryName("graft_sess")
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      // two events 30s apart (merge: gap is 1 min), one 5 min later
      stream.addData(("AAA", 0L), ("AAA", min / 2), ("AAA", 5 * min))
      query.processAllAvailable()
      // push the watermark far past both sessions → they emit & close
      stream.addData(("AAA", 30 * min))
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("graft_sess")
      .select("session_start", "session_end", "symbol", "cnt")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(out === Set(
      (0L, min / 2 + min, "AAA", 2L),      // merged pair; end = last+gap
      (5 * min, 6 * min, "AAA", 1L)))
  }

  test("stream-stream join pairs events within the time window only") {
    implicit val sqlCtx = spark.sqlContext
    val lStream = MemoryStream[(String, Long, Double)]
    val rStream = MemoryStream[(String, Long, Double)]
    val checkpoint = Files.createTempDirectory("graft-ckpt-ssj").toString
    val min = 60L * 1000000L // 1 minute in µs
    val left = lStream.toDF().toDF("symbol", "us", "l_val")
      .withColumn("l_time", timestamp_micros(col("us"))).drop("us")
    val right = rStream.toDF().toDF("symbol_r", "us", "r_val")
      .withColumn("r_time", timestamp_micros(col("us"))).drop("us")
    val query = StreamingPipeline.streamStreamJoin(left, right)
      .select("symbol", "l_val", "r_val")
      .writeStream.format("memory").queryName("graft_ssj")
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      // right events: one inside the 1-minute window of the left event,
      // one too old, one in the future; plus a key that never matches
      lStream.addData(("AAA", 10 * min, 1.0))
      rStream.addData(("AAA", 10 * min - min / 2, 2.0), // in window
        ("AAA", 8 * min, 3.0),                          // too old
        ("AAA", 11 * min, 4.0),                         // after l_time
        ("BBB", 10 * min, 5.0))                         // wrong key
      query.processAllAvailable()
      // advance both watermarks so the joinable region closes
      lStream.addData(("ZZZ", 30 * min, 0.0))
      rStream.addData(("ZZZ", 30 * min, 0.0))
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("graft_ssj")
      .as[(String, Double, Double)].collect().toSet
    assert(out === Set(("AAA", 1.0, 2.0), ("ZZZ", 0.0, 0.0)))
  }

  // NOTE: StreamingPipeline.kafkaSource/kafkaSink cannot be exercised in
  // this container — the spark-sql-kafka connector jar is not bundled in
  // /opt/spark/jars (separate artifact) so even plan-time resolution of
  // format("kafka") fails. The transform chain is source-agnostic and
  // fully covered via MemoryStream above.

  test("restart-on-error rebuilds the query (T6)") {
    var builds = 0
    StreamingPipeline.awaitWithRestart({ () =>
      builds += 1
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[String]
      val q = StreamingPipeline.start(
          Parse.parse(stream.toDF().select(col("value"))),
          Files.createTempDirectory(s"graft-ckpt-r$builds").toString,
          trigger = Trigger.ProcessingTime(0L),
          queryName = s"graft-restart-$builds") { (_, _) => () }
      if (builds == 1) {
        q.stop(); throw new RuntimeException("injected failure")
      }
      q.stop()
      q
    }, maxRestarts = 1)
    assert(builds === 2)
  }
}
