package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingPipeline

/** Large-state streaming under the RocksDB state store (round-12
  * verdict #5): the bounded-state Bloom twin fixed DEDUP state, but
  * windowed/session aggregations and stream-stream joins keep one
  * state row per open key, and the default HDFSBackedStateStoreProvider
  * holds ALL of it on the executor heap — at 100× key cardinality
  * that is executor OOM, not a slowdown. Spark ships
  * RocksDBStateStoreProvider (state in native memory + local SST
  * files, spillable, with changelog checkpointing) as the drop-in for
  * exactly that regime; this spec pins that our watermarked tumbling
  * aggregation produces IDENTICAL results under it, so flipping the
  * provider at scale is a pure config change, not a semantics change.
  *
  * The provider is read from the session conf at query START, so the
  * spec sets it, runs the same scenario StreamingSpec's E2 case runs
  * on the default store (two buckets out of order, watermark advance,
  * a late row that must be dropped), and restores the conf — the
  * shared session's other suites keep the default provider.
  */
class RocksDbStateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("watermarked tumbling agg under RocksDB: same closes, same " +
    "late-drop, bit-identical rows vs the default store") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val stream = MemoryStream[(String, Long, Double)]
      val checkpoint = Files.createTempDirectory("graft-ckpt-rocks").toString
      val min = 60L * 1000000L
      val bars = stream.toDF().toDF("symbol", "us", "close")
        .withColumn("event_time", timestamp_micros(col("us")))
      val query = StreamingPipeline.windowedCounts(bars)
        .writeStream.format("memory").queryName("graft_rocks_wagg")
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .start()
      try {
        stream.addData(("AAA", min + 1, 2.0), ("AAA", 5L, 1.0),
          ("AAA", 10L, 4.0), ("BBB", 7L, 3.0))
        query.processAllAvailable()
        stream.addData(("AAA", 10 * min, 9.0))
        query.processAllAvailable()
        stream.addData(("AAA", 20L, 100.0)) // late → dropped
        query.processAllAvailable()
        // the RocksDB provider must actually be in effect for the
        // running query, not just set on the session — its custom
        // state metrics (rocksdbGet/Put/...) only appear when the
        // store is really RocksDB-backed
        assert(query.lastProgress.json.contains("rocksdb"),
          query.lastProgress.json)
      } finally query.stop()
      val out = spark.table("graft_rocks_wagg")
        .select("bucket_us", "symbol", "cnt", "sum_cents")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(out === Set(
        (0L, "AAA", 2L, 500L),
        (0L, "BBB", 1L, 300L),
        (min, "AAA", 1L, 200L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("session windows under RocksDB: same merges, same closes, " +
    "bit-identical rows vs the default store") {
    // the SESSION store is the stateful-merging window (unbounded key
    // cardinality × one open session each) — the exact regime the
    // provider swap exists for; scenario mirrors StreamingSpec's
    // default-store case row for row
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val stream = MemoryStream[(String, Long)]
      val checkpoint = Files.createTempDirectory("graft-ckpt-rocks-sess")
        .toString
      val min = 60L * 1000000L
      val bars = stream.toDF().toDF("symbol", "us")
        .withColumn("event_time", timestamp_micros(col("us")))
      val query = StreamingPipeline.sessionCounts(bars)
        .writeStream.format("memory").queryName("graft_rocks_sess")
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .start()
      try {
        stream.addData(("AAA", 0L), ("AAA", min / 2), ("AAA", 5 * min))
        query.processAllAvailable()
        stream.addData(("AAA", 30 * min))
        query.processAllAvailable()
        assert(query.lastProgress.json.contains("rocksdb"),
          query.lastProgress.json)
      } finally query.stop()
      val out = spark.table("graft_rocks_sess")
        .select("session_start", "session_end", "symbol", "cnt")
        .as[(Long, Long, String, Long)].collect().toSet
      assert(out === Set(
        (0L, min / 2 + min, "AAA", 2L),
        (5 * min, 6 * min, "AAA", 1L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("stream-stream join under RocksDB: same pairs, same eviction, " +
    "bit-identical rows vs the default store") {
    // two-sided join state (rate × (watermark + window) buffered rows
    // per side) is the largest state any operator here keeps —
    // scenario mirrors StreamingSpec's default-store case row for row
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val lStream = MemoryStream[(String, Long, Double)]
      val rStream = MemoryStream[(String, Long, Double)]
      val checkpoint = Files.createTempDirectory("graft-ckpt-rocks-ssj")
        .toString
      val min = 60L * 1000000L
      val left = lStream.toDF().toDF("symbol", "us", "l_val")
        .withColumn("l_time", timestamp_micros(col("us"))).drop("us")
      val right = rStream.toDF().toDF("symbol_r", "us", "r_val")
        .withColumn("r_time", timestamp_micros(col("us"))).drop("us")
      val query = StreamingPipeline.streamStreamJoin(left, right)
        .select("symbol", "l_val", "r_val")
        .writeStream.format("memory").queryName("graft_rocks_ssj")
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .start()
      try {
        lStream.addData(("AAA", 10 * min, 1.0))
        rStream.addData(("AAA", 10 * min - min / 2, 2.0),
          ("AAA", 8 * min, 3.0),
          ("AAA", 11 * min, 4.0),
          ("BBB", 10 * min, 5.0))
        query.processAllAvailable()
        lStream.addData(("ZZZ", 30 * min, 0.0))
        rStream.addData(("ZZZ", 30 * min, 0.0))
        query.processAllAvailable()
        assert(query.lastProgress.json.contains("rocksdb"),
          query.lastProgress.json)
      } finally query.stop()
      val out = spark.table("graft_rocks_ssj")
        .as[(String, Double, Double)].collect().toSet
      assert(out === Set(("AAA", 1.0, 2.0), ("ZZZ", 0.0, 0.0)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
