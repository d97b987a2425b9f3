package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling
import graft.streaming.{PrioRow, StreamingPrioritySample}

/** The streaming priority sample must be BIT-IDENTICAL to the batch
  * sampler after draining any chunking — priorities are hash-derived,
  * so the top-(k+1) set, the tau threshold, and the w_hat estimates
  * are all deterministic functions of the row set, not of arrival
  * order or batch boundaries.
  */
class StreamingPrioritySampleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val k = 7
  // ids with a spread of weights; some heavy rows that must win and
  // a tail that only enters via hash luck
  private val rows: Seq[(Long, Long)] =
    (1L to 400L).map(i => (i, 1L + (i * 37) % 50))

  private def batchSample: Set[(Long, Long, Double, Double)] =
    Sampling.prioritySample(rows.toDF("id", "w"), col("id"), col("w"), k)
      .as[(Long, Long, Double, Double)].collect().toSet

  test("batch mode: keyed-state sampler == Sampling.prioritySample " +
      "(ids, priorities, tau-backed w_hat all bit-equal)") {
    val out = StreamingPrioritySample.sample(
        StreamingPrioritySample.observations(
          rows.toDF("id", "w"), col("id"), col("w"), k), k)
      .collect()
    assert(out.map(_.seq).distinct === Array(1L))
    assert(out.map(r => (r.id, r.w, r.priority, r.w_hat)).toSet
      === batchSample)
  }

  test("streaming: final-seq rows == batch sampler on any chunking; " +
      "replaying the corpus leaves the sample unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val query = StreamingPrioritySample.sample(
        StreamingPrioritySample.observations(
          stream.toDF.toDF("id", "w"), col("id"), col("w"), k), k)
      .writeStream.format("memory").queryName("prio_out")
      .outputMode("update").start()
    def latest(): Set[(Long, Long, Double, Double)] = {
      val all = spark.table("prio_out").as[PrioRow].collect()
      val mx = all.map(_.seq).max
      all.filter(_.seq == mx)
        .map(r => (r.id, r.w, r.priority, r.w_hat)).toSet
    }
    try {
      val chunks = Seq(rows.take(50), rows.slice(50, 51),
        rows.slice(51, 300), rows.drop(300))
      chunks.foreach { c => stream.addData(c); query.processAllAvailable() }
      assert(latest() === batchSample, "drained sample != batch sampler")
      // full-history replay: every id re-offers the same priority —
      // the sample (and its w_hat weights) must not move
      stream.addData(rows)
      query.processAllAvailable()
      assert(latest() === batchSample, "replay moved the sample")
    } finally query.stop()
  }

  test("checkpoint RESTART: the top-(k+1) reservoir survives a " +
      "stop/restart — post-restart rows merge into the SAME sample") {
    // round-15 (r14 verdict #4). Feed most of the corpus, restart,
    // feed only the tail: the final sample equals the batch sampler
    // over the WHOLE corpus only if the pre-restart reservoir
    // round-tripped (with lost state the sample would cover the tail
    // alone and every w_hat/tau would move).
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-prio-ckpt").toString
    val stream = MemoryStream[(Long, Long)]
    val buf = java.util.Collections.synchronizedList(
      new java.util.ArrayList[PrioRow]())
    def startQ() = StreamingPrioritySample.sample(
        StreamingPrioritySample.observations(
          stream.toDF.toDF("id", "w"), col("id"), col("w"), k), k)
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[PrioRow], _: Long) =>
          buf.addAll(java.util.Arrays.asList(ds.collect(): _*)); ()
      }
      .start()
    def latestFromBuf(): Set[(Long, Long, Double, Double)] = {
      import scala.jdk.CollectionConverters._
      val all = buf.asScala.toSeq
      val mx = all.map(_.seq).max
      all.filter(_.seq == mx)
        .map(r => (r.id, r.w, r.priority, r.w_hat)).toSet
    }
    val q1 = startQ()
    try { stream.addData(rows.take(300)); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = startQ()
    try {
      stream.addData(rows.drop(300)); q2.processAllAvailable()
    } finally q2.stop()
    assert(latestFromBuf() === batchSample,
      "cross-restart sample must equal the one-shot batch sampler")
  }

  test("map-side prune: localTop keeps exactly the global top-n " +
      "under its bounded-buffer trimming") {
    val obs = rows.map { case (i, w) =>
      graft.streaming.PrioObs(i, w, w.toDouble / (i % 13 + 1).toDouble) }
    val got = StreamingPrioritySample.localTop(obs.iterator, 9).toSeq
    val want = obs.sortBy(e => (-e.priority, e.id)).take(9)
    assert(got.sortBy(e => (-e.priority, e.id)) === want)
  }

  test("EQUAL priorities across distinct ids: streaming and batch " +
      "pick the same survivors and the same tau (round-12 sweep " +
      "target — the tie comparator must match the batch ORDER BY)") {
    // six ids share priority 5.0, two share 3.0, k=4 cuts INSIDE the
    // 5.0 tie group — survivors must be the lowest ids, tau the
    // (k+1)-th element under (priority desc, id asc) on BOTH sides
    val tied = Seq(
      graft.streaming.PrioObs(11L, 5L, 5.0),
      graft.streaming.PrioObs(3L, 5L, 5.0),
      graft.streaming.PrioObs(7L, 5L, 5.0),
      graft.streaming.PrioObs(20L, 5L, 5.0),
      graft.streaming.PrioObs(15L, 5L, 5.0),
      graft.streaming.PrioObs(9L, 5L, 5.0),
      graft.streaming.PrioObs(2L, 3L, 3.0),
      graft.streaming.PrioObs(30L, 3L, 3.0))
    val k = 4
    // the streaming merge path: localTop prune + the same comparator
    // the keyed state uses
    val pruned = StreamingPrioritySample.localTop(
      scala.util.Random.shuffle(tied).iterator, k + 1).toSeq
    val streamOrder = pruned.sortBy(e => (-e.priority, e.id))
    assert(streamOrder.take(k).map(_.id) === Seq(3L, 7L, 9L, 11L))
    val tauStream = streamOrder(k).priority
    assert(tauStream === 5.0) // the (k+1)-th is still inside the tie
    // the batch side: identical ORDER BY on a DataFrame
    val batchOrder = tied.toDF("id", "w", "priority")
      .orderBy(col("priority").desc, col("id")).limit(k + 1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(batchOrder.take(k).map(_._1) === Seq(3L, 7L, 9L, 11L))
    assert(batchOrder.last._3 === tauStream)
  }
}
