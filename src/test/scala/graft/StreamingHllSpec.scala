package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CardSketch
import graft.streaming.StreamingHll

/** Streaming HLL registers must converge to the oracle-gated batch
  * registers (q_hll_ngrams' machinery) bit-for-bit on any micro-batch
  * chunking — max over exact integers is order-free and
  * duplicate-absorbing, which is the whole sketch contract.
  */
class StreamingHllSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val mBits = 8
  private val items = (0 until 3000).map(i => s"item_${i % 2200}") // dups

  private def batchRegisters: Map[Long, Long] =
    CardSketch.hllRegisters(items.toDF("x"), col("x"), mBits)
      .as[(Long, Long)].collect().toMap

  test("batch-mode equivalence: keyed-state registers == aggregate") {
    val out = StreamingHll.registers(
        StreamingHll.observations(items.toDF("x"), col("x"), mBits))
      .collect().map(r => (r.bucket, r.max_rho)).toMap
    assert(out === batchRegisters)
  }

  test("streaming: register parity across uneven micro-batch splits; " +
      "duplicate-only batches emit nothing") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val query = StreamingHll.registers(
        StreamingHll.observations(stream.toDF.toDF("x"), col("x"), mBits))
      .writeStream.format("memory").queryName("hll_out")
      .outputMode("update").start()
    try {
      val chunks = Seq(items.take(500), items.slice(500, 501),
        items.slice(501, 2500), items.drop(2500))
      chunks.foreach { c => stream.addData(c); query.processAllAvailable() }
      // replaying the whole corpus grows NO register → nothing emitted
      val before = spark.table("hll_out").count()
      stream.addData(items)
      query.processAllAvailable()
      assert(spark.table("hll_out").count() === before,
        "duplicate replay must not re-emit registers")
    } finally query.stop()
    val fin = spark.table("hll_out").as[(Long, Long)]
      .collect().groupBy(_._1)
      .map { case (b, vs) => (b, vs.map(_._2).max) }
    assert(fin === batchRegisters)
  }

  test("grouped registers (rolling-WAU twin): streamed user-day " +
      "observations == batch per-day sketch on any chunking") {
    // the q_hll_wau shape: each (user, day) serves days day..day+6
    val userDays = for {
      u <- 0 until 120
      d <- Seq(u % 5, u % 3 + 4)               // two active days/user
      t <- d to d + 6                          // the ×7 replication
    } yield (t.toLong, s"$u")                  // (window day, user key)
    val batch = CardSketch.hllRegistersBy(
        userDays.toDF("t_day", "u"), col("t_day"), col("u"), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val query = StreamingHll.groupedRegisters(
        StreamingHll.groupedObservations(
          stream.toDF.toDF("t_day", "u"), col("t_day"), col("u"), 6))
      .toDF("grp", "bucket", "max_rho")
      .writeStream.format("memory").queryName("hll_wau_out")
      .outputMode("update").start()
    try {
      // uneven chunks, duplicates straddling the boundaries
      val chunks = Seq(userDays.take(300), userDays.slice(250, 301),
        userDays.slice(301, 700), userDays.drop(650))
      chunks.foreach { c => stream.addData(c); query.processAllAvailable() }
    } finally query.stop()
    val fin = spark.table("hll_wau_out")
      .as[(Long, Long, Long)].collect()
      .groupBy(t => (t._1, t._2))
      .map { case (k, vs) => k -> vs.map(_._3).max }
    assert(fin === batch,
      "drained grouped registers must equal the batch per-day sketch")
  }

  test("checkpoint RESTART: retiring grouped registers resume from " +
      "saved state — replays emit nothing, no spurious rebuilds") {
    import graft.streaming.GroupedHllRegister
    val dayMs = 86400000L
    def ts(day: Long): java.sql.Timestamp =
      new java.sql.Timestamp(day * dayMs + dayMs / 2)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-hll-ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val buf = java.util.Collections.synchronizedList(
      new java.util.ArrayList[GroupedHllRegister]())
    def startQ() = StreamingHll.groupedRegistersRetiring(
        StreamingHll.groupedObservationsTimed(
          stream.toDF.toDF("day", "u", "t"), col("day"), col("u"),
          col("t"), mBits = 6, delay = "1 hour"),
        retireAtMs = day => (day + 1) * dayMs + 7 * dayMs)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[GroupedHllRegister], _: Long) =>
          buf.addAll(java.util.Arrays.asList(df.collect(): _*)); ()
      }
      .start()
    val firstWave = (0 until 40).map(u => (0L, s"u$u", ts(0)))
    val q1 = startQ()
    try { stream.addData(firstWave); q1.processAllAvailable() }
    finally q1.stop()
    val afterRun1 = buf.size()
    assert(afterRun1 > 0)

    // restart from the SAME checkpoint: a pure replay of run-1 users
    // must emit NOTHING (their registers are already absorbed — with
    // LOST state every bucket would re-emit), and new users must keep
    // GROWING the same sketch
    val q2 = startQ()
    try {
      stream.addData(firstWave.take(10)); q2.processAllAvailable()
      assert(buf.size() === afterRun1,
        "replay after restart re-emitted: keyed state was lost")
      stream.addData((40 until 80).map(u => (0L, s"u$u", ts(0))))
      q2.processAllAvailable()
    } finally q2.stop()
    import scala.jdk.CollectionConverters._
    val drained = buf.asScala.toSeq
    assert(drained.forall(!_.rebuilt), "restart must not look like a rebuild")
    val fin = drained.groupBy(r => (r.grp, r.bucket))
      .map { case (k, vs) => k -> vs.map(_.max_rho).max }
    val batch = CardSketch.hllRegistersBy(
        (0 until 80).map(u => (0L, s"u$u")).toDF("d", "u"),
        col("d"), col("u"), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(fin === batch,
      "registers across the restart must equal the one-shot batch sketch")
  }

  test("retiring registers: a group born AFTER its deadline passed " +
      "flags rebuilt=true on first emission (round-15 sweep — the " +
      "docstring's 'born posthumously' case, now pinned)") {
    import graft.streaming.GroupedHllRegister
    val dayMs = 86400000L
    def ts(day: Double): java.sql.Timestamp =
      new java.sql.Timestamp((day * dayMs).toLong)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val buf = java.util.Collections.synchronizedList(
      new java.util.ArrayList[GroupedHllRegister]())
    // deadline: window-day end + 7 days grace
    val query = StreamingHll.groupedRegistersRetiring(
        StreamingHll.groupedObservationsTimed(
          stream.toDF.toDF("day", "u", "t"), col("day"), col("u"),
          col("t"), mBits = 6, delay = "1 hour"),
        retireAtMs = day => (day + 1) * dayMs + 7 * dayMs)
      .writeStream
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-hll-posthumous").toString)
      .outputMode("update")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[GroupedHllRegister], _: Long) =>
          buf.addAll(java.util.Arrays.asList(df.collect(): _*)); ()
      }
      .start()
    import scala.jdk.CollectionConverters._
    try {
      // batch 1: group 0 born young (watermark ≈ 0 << deadline day 8)
      stream.addData((0L, "u1", ts(0.5))); query.processAllAvailable()
      assert(buf.asScala.forall(!_.rebuilt),
        "a young group's first emission must not flag rebuilt")
      // batch 2: advance the watermark to ~day 30 — far past group
      // 0's day-8 deadline (retires it) and past day 5's day-13
      // deadline (so a later day-5 birth is posthumous)
      stream.addData((30L, "u1", ts(30.5))); query.processAllAvailable()
      assert(buf.asScala.filter(_.grp == 30L).forall(!_.rebuilt))
      // batch 3, the pins: group 5 is BORN after its deadline passed
      // (first row ever, new-enough event_time) → rebuilt=true; and
      // group 0 was RETIRED, so a re-keyed row also flags
      stream.addData((5L, "u9", ts(30.6)), (0L, "u9", ts(30.6)))
      query.processAllAvailable()
      val born = buf.asScala.filter(r => r.grp == 5L)
      val rekey = buf.asScala.filter(r => r.grp == 0L && r.rebuilt)
      assert(born.nonEmpty && born.forall(_.rebuilt),
        "posthumous birth must flag rebuilt=true (docstring contract)")
      assert(rekey.nonEmpty,
        "a re-keyed retired group must flag rebuilt=true")
      // and group 30 (still open) never flagged across the run
      assert(buf.asScala.filter(_.grp == 30L).forall(!_.rebuilt),
        "retiring/rebuilding old groups must not touch open groups")
    } finally query.stop()
  }

  test("END-TO-END streaming rolling WAU: in-stream ×7 replication " +
      "(stateless) + retiring registers == the batch window sketch") {
    val dayMs = 86400000L
    def ts(day: Long): java.sql.Timestamp =
      new java.sql.Timestamp(day * dayMs + dayMs / 2)
    // users active on (u%2) and day 1 — raw events, NOT pre-replicated
    val events = (for { u <- 0 until 50; d <- Seq((u % 2).toLong, 1L) }
      yield (s"u$u", d)).distinct
    val repl = events.flatMap { case (u, d) => (d to d + 6).map(t => (t, u)) }
    val batch = CardSketch.hllRegistersBy(
        repl.toDF("t_day", "u"), col("t_day"), col("u"), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, java.sql.Timestamp)]
    // the ×7 replication IS the stream plan: day from event time,
    // explode(sequence) to the window days an event serves — all
    // stateless projections ahead of the one keyed-state operator
    val src = stream.toDF.toDF("u", "t")
      .withColumn("day", expr("unix_millis(t) DIV 86400000"))
      .select(col("u"), col("t"),
        explode(sequence(col("day"), col("day") + lit(6L))).as("t_day"))
    val query = StreamingHll.groupedRegistersRetiring(
        StreamingHll.groupedObservationsTimed(src, col("t_day"), col("u"),
          col("t"), mBits = 6, delay = "1 hour"),
        // grace = a full window span: nothing retires inside the test
        retireAtMs = day => (day + 1) * dayMs + 7 * dayMs)
      .writeStream.format("memory").queryName("hll_wau_e2e")
      .outputMode("update").start()
    try {
      val rows = events.map { case (u, d) => (u, ts(d)) }
      // day-0 rows first, then day-1 (in watermark order), uneven cuts
      val ordered = rows.sortBy(_._2.getTime)
      Seq(ordered.take(20), ordered.slice(20, 21), ordered.drop(21))
        .foreach { c => stream.addData(c); query.processAllAvailable() }
    } finally query.stop()
    import graft.streaming.GroupedHllRegister
    val fin = spark.table("hll_wau_e2e").as[GroupedHllRegister]
      .collect().groupBy(r => (r.grp, r.bucket))
      .map { case (k, vs) => k -> vs.map(_.max_rho).max }
    assert(fin === batch,
      "drained end-to-end WAU registers must equal the batch sketch")
  }

  test("retiring grouped registers: closed-day state drops, open-day " +
      "registers unchanged, late rows rejected, rebuilds flagged") {
    import graft.streaming.GroupedHllRegister
    val dayMs = 86400000L
    def ts(day: Long, frac: Double = 0.5): java.sql.Timestamp =
      new java.sql.Timestamp((day * dayMs + (frac * dayMs).toLong))
    // retire a day-group once the watermark passes its day end + 6h
    val retireAt = (day: Long) => (day + 1) * dayMs + 6 * 3600000L

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val query = StreamingHll.groupedRegistersRetiring(
        StreamingHll.groupedObservationsTimed(
          stream.toDF.toDF("day", "u", "t"),
          col("day"), col("u"), col("t"), mBits = 6,
          delay = "1 hour"),
        retireAt)
      .writeStream.format("memory").queryName("hll_retire_out")
      .outputMode("update").start()
    try {
      def stateRows: Long =
        query.lastProgress.stateOperators.head.numRowsTotal
      // day 0 and day 1 active; day-1 events sit EARLY in day 1 so the
      // watermark (max event − 1h = 25.4h) stays under retireAt(0)=30h
      val d0 = (0 until 80).map(u => (0L, s"u$u", ts(0)))
      val d1 = (0 until 60).map(u => (1L, s"v$u", ts(1, 0.1)))
      stream.addData(d0 ++ d1); query.processAllAvailable()
      val rowsBoth = stateRows
      val day1Before = spark.table("hll_retire_out")
        .as[GroupedHllRegister].collect().filter(_.grp == 1L)
        .groupBy(_.bucket).map { case (b, vs) => b -> vs.map(_.max_rho).max }
      assert(rowsBoth > 0)
      assert(spark.table("hll_retire_out").as[GroupedHllRegister]
        .collect().forall(!_.rebuilt), "nothing is a rebuild yet")

      // jump the watermark past day 0's deadline but NOT day 1's:
      // event time 1.5d (a day-1 event serving the day-2 trailing
      // window) → wm = 36h − 1h = 35h: > retireAt(0)=30h,
      // < retireAt(1)=54h, and < the 45.6h day-1 stragglers below
      stream.addData(Seq((2L, "w0", ts(1, 0.5)))); query.processAllAvailable()
      // timeout sweep needs a subsequent batch after the wm advanced
      stream.addData(Seq((2L, "w1", ts(1, 0.5)))); query.processAllAvailable()
      val rowsAfter = stateRows
      assert(rowsAfter < rowsBoth,
        s"day-0 state must retire: $rowsBoth -> $rowsAfter")

      // day 1 is still open (retireAt(1) = day2 + 1h > wm): growing it
      // must continue FROM EXISTING state — same grow-only contract,
      // bit-equal to the batch sketch over all day-1 users
      val d1b = (60 until 90).map(u => (1L, s"v$u", ts(1, 0.9)))
      stream.addData(d1b); query.processAllAvailable()
      val day1After = spark.table("hll_retire_out")
        .as[GroupedHllRegister].collect().filter(_.grp == 1L)
        .groupBy(_.bucket).map { case (b, vs) => b -> vs.map(_.max_rho).max }
      val day1Batch = CardSketch.hllRegistersBy(
          (0 until 90).map(u => (1L, s"v$u")).toDF("d", "u"),
          col("d"), col("u"), 6)
        .collect().filter(_.getLong(0) == 1L)
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(day1After === day1Batch,
        "open-day registers must keep growing from pre-retirement state")
      assert(day1Before.forall { case (b, v) => day1Batch(b) >= v })

      // a LATE row (event time behind the watermark) keyed to the
      // retired day 0 is rejected by the operator's late-row filter:
      // no emission, no state resurrection
      val emitted = spark.table("hll_retire_out").count()
      stream.addData(Seq((0L, "late_user", ts(0)))); query.processAllAvailable()
      assert(spark.table("hll_retire_out").count() === emitted,
        "late rows behind the watermark must be dropped")

      // a NEW-ENOUGH event keyed to the retired day 0 rebuilds from
      // zero and says so: rebuilt=true (event at 60h > wm 44.6h)
      stream.addData(Seq((0L, "phoenix", ts(2, 0.5))))
      query.processAllAvailable()
      val rebuilt = spark.table("hll_retire_out")
        .as[GroupedHllRegister].collect().filter(_.rebuilt)
      assert(rebuilt.nonEmpty && rebuilt.forall(_.grp == 0L),
        "a re-keyed retired group must emit the rebuilt flag")
    } finally query.stop()
  }
}
