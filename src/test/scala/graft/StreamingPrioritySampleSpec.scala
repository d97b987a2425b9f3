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

  test("map-side prune: localTop keeps exactly the global top-n " +
      "under its bounded-buffer trimming") {
    val obs = rows.map { case (i, w) =>
      graft.streaming.PrioObs(i, w, w.toDouble / (i % 13 + 1).toDouble) }
    val got = StreamingPrioritySample.localTop(obs.iterator, 9).toSeq
    val want = obs.sortBy(e => (-e.priority, e.id)).take(9)
    assert(got.sortBy(e => (-e.priority, e.id)) === want)
  }
}
