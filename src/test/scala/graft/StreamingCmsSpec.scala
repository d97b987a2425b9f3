package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketch
import graft.streaming.StreamingCms

/** The streaming count–min sketch must converge to the oracle-gated
  * batch sketch's counter relation (q_cms_topk's internals) counter
  * for counter, regardless of micro-batch chunking — integer sums are
  * order-free, so drained-stream state == batch aggregation exactly.
  */
class StreamingCmsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val d = 3
  private val w = 16

  private val rnd = new scala.util.Random(31)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
  // Zipf-ish draws so some terms are genuinely heavy
  private val docs = (0 until 40).map { i =>
    val n = 3 + rnd.nextInt(8)
    val words = Seq.fill(n)(vocab(
      math.min(vocab.size - 1, (math.pow(rnd.nextDouble(), 2) * vocab.size).toInt)))
    (i.toLong, words.mkString(" "))
  }

  private def batchCounters: Set[(Int, Long, Long)] = {
    val exact = docs.toDF("doc_id", "text")
      .select(explode(graft.operators.TermStats.cleanWords(col("text")))
        .as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    exact
      .select(col("term"), col("cnt"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("cell", Sketch.cmsCell(col("r"), col("term"), w))
      .groupBy("r", "cell").agg(sum(col("cnt")).as("c"))
      .as[(Int, Long, Long)].collect().toSet
  }

  test("batch-mode equivalence: keyed-state counters == aggregate") {
    val out = StreamingCms.counters(
        StreamingCms.increments(docs.toDF("doc_id", "text"),
          col("text"), d, w))
      .collect().map(c => (c.r, c.cell, c.c)).toSet
    assert(out === batchCounters)
  }

  test("streaming: counter parity across uneven micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val query = StreamingCms.counters(
        StreamingCms.increments(stream.toDF.toDF("doc_id", "text"),
          col("text"), d, w))
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("update").start()
    try {
      val chunks = Seq(docs.take(7), docs.slice(7, 8), docs.slice(8, 29),
        docs.drop(29))
      chunks.foreach { c => stream.addData(c); query.processAllAvailable() }
    } finally query.stop()
    // counters only grow: the final sketch is the max per cell
    val fin = spark.table("cms_out").as[(Int, Long, Long)]
      .collect().groupBy(t => (t._1, t._2))
      .map { case ((r, cell), vs) => (r, cell, vs.map(_._3).max) }.toSet
    assert(fin === batchCounters)
    // sketch contract spot-check: estimate dominates the exact count
    val byCell = fin.map(t => (t._1, t._2) -> t._3).toMap
    val exact = docs.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val termCells = exact.keys.toSeq.toDF("t")
      .select(col("t"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("t"), col("r"), Sketch.cmsCell(col("r"), col("t"), w))
      .as[(String, Int, Long)].collect()
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.map(x => (x._2, x._3)).toSeq }
    exact.foreach { case (term, cnt) =>
      val est = termCells(term)
        .map { case (r, cell) => byCell.getOrElse((r, cell), 0L) }.min
      assert(est >= cnt, s"CMS estimate must dominate exact for $term")
    }
  }
}
