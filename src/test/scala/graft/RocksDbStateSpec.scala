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

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  // ---- the flatMapGroupsWithState family (round-13 verdict #5): the
  // custom keyed-state twins also live in the state store, and they
  // are exactly what runs at 100× key cardinality. Each case drains a
  // multi-chunk stream under RocksDB, asserts the provider was REALLY
  // in effect (its rocksdb* metrics appear in the progress json), and
  // compares the drained rows bit-identical to the same operator's
  // batch-mode run (each already pinned to its oracle-gated batch
  // analogue by its own suite). ----

  test("StatefulIndicators under RocksDB: bar-for-bar equal to batch") {
    import graft.streaming.{Bar, EnrichedBar, StatefulIndicators}
    val bars: Seq[Bar] = for {
      s <- Seq("AAA", "BBB"); i <- 0 until 40
    } yield Bar(s, i.toLong, 50.0 + ((i * 13 + s.length) % 17) - ((i * 7) % 5))
    def norm(rows: Seq[EnrichedBar]) = rows.sortBy(r => (r.symbol, r.ts))
    val expected = norm(StatefulIndicators.enrich(bars.toDS()).collect().toSeq)
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Bar]
      val query = StatefulIndicators.enrich(stream.toDS())
        .writeStream.format("memory").queryName("rocks_indicators")
        .outputMode("append").start()
      try {
        Seq(bars.take(9), bars.slice(9, 41), bars.drop(41)).foreach { c =>
          stream.addData(c); query.processAllAvailable()
        }
        assert(query.lastProgress.json.contains("rocksdb"),
          query.lastProgress.json)
      } finally query.stop()
      val out = spark.table("rocks_indicators").as[EnrichedBar]
        .collect().toSeq
      assert(norm(out) === expected)
    }
  }

  test("StreamingBloomDedup under RocksDB: survivor set equals batch") {
    import graft.streaming.StreamingBloomDedup
    val rows = (0 until 1500).map(i => (s"doc_${i % 1100}", i.toLong))
    val expected = StreamingBloomDedup.firstSeen(
        StreamingBloomDedup.observations(
          rows.toDF("k", "o"), col("k"), col("o"), shards = 8))
      .collect().map(f => (f.key, f.ord)).toSet
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(String, Long)]
      val query = StreamingBloomDedup.firstSeen(
          StreamingBloomDedup.observations(
            stream.toDF.toDF("k", "o"), col("k"), col("o"), shards = 8))
        .writeStream.format("memory").queryName("rocks_bloom")
        .outputMode("update").start()
      try {
        Seq(rows.take(600), rows.slice(600, 1101), rows.drop(1101))
          .foreach { c => stream.addData(c); query.processAllAvailable() }
        assert(query.lastProgress.json.contains("rocksdb"),
          query.lastProgress.json)
      } finally query.stop()
      val out = spark.table("rocks_bloom").as[(String, Long)]
        .collect().toSet
      assert(out === expected)
    }
  }

  test("grouped StreamingHll (retiring) under RocksDB: registers equal " +
    "batch sketch and closed groups still retire") {
    import graft.streaming.{GroupedHllRegister, StreamingHll}
    import graft.operators.CardSketch
    val dayMs = 86400000L
    // day-0 rows BEFORE day-1 rows: a day-1 event advances the
    // watermark past every day-0 timestamp, so an interleaved feed
    // would (correctly) drop straggling day-0 rows as late — this
    // case pins register parity, not late-drop, so feed in order
    val userDays = for {
      t <- Seq(0L, 1L); u <- 0 until 80
    } yield (t, s"u${u * (t + 1)}",
      new java.sql.Timestamp(t * dayMs + dayMs / 10))
    val expected = CardSketch.hllRegistersBy(
        userDays.map(r => (r._1, r._2)).toDF("t_day", "u"),
        col("t_day"), col("u"), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
      val query = StreamingHll.groupedRegistersRetiring(
          StreamingHll.groupedObservationsTimed(
            stream.toDF.toDF("day", "u", "t"), col("day"), col("u"),
            col("t"), mBits = 6, delay = "1 hour"),
          retireAtMs = day => (day + 1) * dayMs + 6 * 3600000L)
        .writeStream.format("memory").queryName("rocks_hll")
        .outputMode("update").start()
      try {
        Seq(userDays.take(80), userDays.drop(80)).foreach { c =>
          stream.addData(c); query.processAllAvailable()
        }
        assert(query.lastProgress.json.contains("rocksdb"),
          query.lastProgress.json)
        val drained = spark.table("rocks_hll").as[GroupedHllRegister]
          .collect().groupBy(r => (r.grp, r.bucket))
          .map { case (k, vs) => k -> vs.map(_.max_rho).max }
        assert(drained === expected)
        // retirement also works under RocksDB: watermark past day 0's
        // deadline sweeps its groups out of the native store
        val before = query.lastProgress.stateOperators.head.numRowsTotal
        stream.addData(Seq((2L, "w0",
          new java.sql.Timestamp(2 * dayMs)))); query.processAllAvailable()
        stream.addData(Seq((2L, "w1",
          new java.sql.Timestamp(2 * dayMs)))); query.processAllAvailable()
        assert(query.lastProgress.stateOperators.head.numRowsTotal < before)
      } finally query.stop()
    }
  }

  test("StreamingCusum under RocksDB: chart rows bit-equal to batch") {
    import graft.streaming.{CusumRow, StreamingCusum}
    // planted level shift on AAA after t=30 fires the upward chart
    val bars = (for (i <- 0 until 60) yield
      ("AAA", i.toLong, if (i < 30) 10.0 + (i % 3) * 0.1 else 13.0)) ++
      (for (i <- 0 until 60) yield ("BBB", i.toLong, 5.0 + (i % 2) * 0.1))
    val targets = Seq(("AAA", 10.1), ("BBB", 5.05)).toDF("symbol", "target")
    val h = 2.0
    val expected = StreamingCusum.chart(
        StreamingCusum.withTargets(
          bars.toDF("symbol", "ts", "close"), targets), h)
      .collect().sortBy(r => (r.symbol, r.ts)).toSeq
    assert(expected.exists(_.alarm), "fixture must exercise the alarm path")
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(String, Long, Double)]
      val query = StreamingCusum.chart(
          StreamingCusum.withTargets(
            stream.toDF.toDF("symbol", "ts", "close"), targets), h)
        .writeStream.format("memory").queryName("rocks_cusum")
        .outputMode("append").start()
      try {
        Seq(bars.take(25), bars.slice(25, 80), bars.drop(80)).foreach { c =>
          stream.addData(c); query.processAllAvailable()
        }
        assert(query.lastProgress.json.contains("rocksdb"),
          query.lastProgress.json)
      } finally query.stop()
      val out = spark.table("rocks_cusum").as[CusumRow]
        .collect().sortBy(r => (r.symbol, r.ts)).toSeq
      assert(out === expected)
    }
  }

  test("StreamingNovelty under RocksDB: Bloom partials equal the " +
    "default-store run exactly") {
    import graft.streaming.{NoveltyPartial, StreamingNovelty}
    val history = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"))
    val incr = Seq((10L, "alpha beta gamma something new here"),
      (11L, "totally fresh words nobody typed before"))
    def drained(name: String): Map[Long, (Long, Long)] = {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      val query = StreamingNovelty.partials(
          StreamingNovelty.observations(
            stream.toDF.toDF("id", "text"), col("id"), col("text"),
            n = 2, shards = 4),
          segLongs = 64)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        Seq(history, incr).foreach { c =>
          stream.addData(c); query.processAllAvailable()
        }
        assert(query.lastProgress.json.contains("rocksdb") ===
          (name == "rocks_novelty"), query.lastProgress.json.take(400))
      } finally query.stop()
      StreamingNovelty.novelty(spark.table(name))
        .select("doc_id", "n_grams", "n_seen")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    }
    val default = drained("default_novelty")
    val rocks = withRocksDb { drained("rocks_novelty") }
    assert(rocks === default && rocks.nonEmpty)
    assert(rocks(10L)._2 > 0 && rocks(11L)._2 === 0L,
      "fixture must exercise both seen and novel grams")
  }

  test("StreamingPrioritySample under RocksDB: final sample equals batch") {
    import graft.streaming.{PrioRow, StreamingPrioritySample}
    val k = 7
    val rows = (1L to 400L).map(i => (i, 1L + (i * 37) % 50))
    val expected = StreamingPrioritySample.sample(
        StreamingPrioritySample.observations(
          rows.toDF("id", "w"), col("id"), col("w"), k), k)
      .collect().map(r => (r.id, r.w, r.priority, r.w_hat)).toSet
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, Long)]
      val query = StreamingPrioritySample.sample(
          StreamingPrioritySample.observations(
            stream.toDF.toDF("id", "w"), col("id"), col("w"), k), k)
        .writeStream.format("memory").queryName("rocks_prio")
        .outputMode("update").start()
      try {
        Seq(rows.take(111), rows.slice(111, 300), rows.drop(300))
          .foreach { c => stream.addData(c); query.processAllAvailable() }
        assert(query.lastProgress.json.contains("rocksdb"),
          query.lastProgress.json)
      } finally query.stop()
      val all = spark.table("rocks_prio").as[PrioRow].collect()
      val mx = all.map(_.seq).max
      val out = all.filter(_.seq == mx)
        .map(r => (r.id, r.w, r.priority, r.w_hat)).toSet
      assert(out === expected)
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
