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
}
