package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Eval
import graft.streaming.StreamingKs

/** Streaming drift-gate parity: the per-trigger KS statistic emitted
  * by [[StreamingKs.ksPerTrigger]] must equal the batch
  * [[Eval.ksTest]] of (that trigger's rows vs the reference) — the
  * same contract StreamingCusumSpec pins for the CUSUM chart: how the
  * feed is chunked into micro-batches must not change any number.
  */
class StreamingKsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // reference: a flat-ish integer sample; feed: first two chunks from
  // the same distribution, third chunk shifted (the planted drift)
  private val reference = (0L until 400L).map(i => (i * 7) % 100)
  private val chunks = Seq(
    (0L until 150L).map(i => (i * 13) % 100),      // in-distribution
    (0L until 37L).map(i => (i * 29) % 100),       // small trigger
    (0L until 200L).map(i => 80L + (i * 3) % 20))  // shifted → drift

  private def batchStat(chunk: Seq[Long]): (Long, Long, Long, Long) = {
    val both = chunk.map((_, true)).toDF("v", "a")
      .unionByName(reference.map((_, false)).toDF("v", "a"))
    val r = Eval.ksTest(both, col("v"), col("a")).collect().head
    (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("ks_num"), r.getAs[Long]("ks_den"))
  }

  test("per-trigger KS equals the batch statistic on each chunk, and " +
    "the planted shift trips the drift flag") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Long]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Boolean)]
    val writer = StreamingKs.ksPerTrigger(
      stream.toDF.toDF("v"), "v",
      reference.toDF("rv"), "rv", threshold = 0.3,
      (stat: DataFrame) => stat.collect().foreach { r =>
        got += ((r.getAs[Long]("batch_id"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b"), r.getAs[Long]("ks_num"),
          r.getAs[Long]("ks_den"), r.getAs[Boolean]("drift")))
      })
    val query = writer.start()
    try chunks.foreach { c => stream.addData(c); query.processAllAvailable() }
    finally query.stop()

    assert(got.size === chunks.size)
    got.sortBy(_._1).zip(chunks).foreach { case (g, chunk) =>
      val (na, nb, num, den) = batchStat(chunk)
      assert((g._2, g._3, g._4, g._5) === ((na, nb, num, den)),
        s"trigger ${g._1} diverged from the batch statistic")
    }
    // only the shifted third chunk crosses the 0.3 threshold
    assert(got.sortBy(_._1).map(_._6).toSeq === Seq(false, false, true))
  }

  test("an empty trigger emits no stat row (ksTest empty contract)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Long]
    var rows = 0L
    val writer = StreamingKs.ksPerTrigger(
      stream.toDF.toDF("v"), "v", reference.toDF("rv"), "rv", 0.3,
      (stat: DataFrame) => rows += stat.count())
    val query = writer.start()
    try {
      stream.addData(Seq.empty[Long])
      query.processAllAvailable()
    } finally query.stop()
    assert(rows === 0L)
  }
}
