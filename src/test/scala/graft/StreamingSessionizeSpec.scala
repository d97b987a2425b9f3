package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize
import graft.streaming.{SessRow, StreamingSessionize}

/** Streaming gap-timeout sessionization must reproduce the
  * oracle-verified batch window form (q_sessionize) row-for-row when
  * fed in ts order — regardless of micro-batch chunking, including a
  * split that lands MID-SESSION (the state must carry the open
  * session's ordinal and last-ts across the boundary).
  */
class StreamingSessionizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val gap = 1000L

  // three users, gaps planted to break sessions at known points
  private val rnd = new scala.util.Random(41)
  private val events = (for {
    u <- 1L to 3L
    i <- 0 until 60
  } yield {
    // ~every 7th step jumps past the gap
    val step = if (i % 7 == 3) gap + 1 + rnd.nextInt(500)
      else 1 + rnd.nextInt(900)
    (u, i, step)
  }).groupBy(_._1).toSeq.flatMap { case (u, steps) =>
    var t = 0L
    steps.sortBy(_._2).map { case (_, i, s) => t += s; (u, t) }
  }.sortBy(_._2)

  private def batchReference: Seq[SessRow] =
    Sessionize.sessionize(events.toDF("user_id", "ts"),
        col("user_id"), col("ts"), gap)
      .select(col("user_id"), col("ts"), col("session_seq"))
      .as[SessRow].collect().sortBy(r => (r.user_id, r.ts)).toSeq

  test("batch-mode equivalence: keyed state == window form") {
    val out = StreamingSessionize.sessions(
        StreamingSessionize.events(events.toDF("user_id", "ts")), gap)
      .collect().sortBy(r => (r.user_id, r.ts)).toSeq
    assert(out === batchReference)
    assert(out.map(_.session_seq).max > 1L,
      "fixture must actually break sessions")
  }

  test("streaming: session ordinals survive mid-session batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val query = StreamingSessionize.sessions(
        StreamingSessionize.events(stream.toDF.toDF("user_id", "ts")),
        gap)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // uneven chunks; several boundaries land inside open sessions
      val chunks = Seq(events.take(13), events.slice(13, 14),
        events.slice(14, 95), events.drop(95))
      chunks.foreach { c => stream.addData(c); query.processAllAvailable() }
    } finally query.stop()
    val out = spark.table("sess_out").as[SessRow]
      .collect().sortBy(r => (r.user_id, r.ts)).toSeq
    assert(out === batchReference)
  }

  test("round-12: cross-batch ordering violation is DETECTABLE — the " +
      "query fails with the contract error, never silent ordinals") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val query = StreamingSessionize.sessions(
        StreamingSessionize.events(stream.toDF.toDF("user_id", "ts")),
        gap)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      stream.addData(Seq((9L, 5000L), (9L, 6000L)))
      query.processAllAvailable()
      // an event OLDER than user 9's last emitted ts arrives later
      stream.addData(Seq((9L, 4000L)))
      val e = intercept[Exception] { query.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("out-of-order event")),
        s"expected the contract error, got: ${messages(e)}")
    } finally query.stop()
  }
}
