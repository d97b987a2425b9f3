package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mmr

/** MMR diverse top-k pinned against a sequential greedy reference on
  * quantized integers (the exactness contract: same quantization, same
  * λ=1/2 integer objective, ties to the lowest id).
  */
class MmrSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // deterministic small corpus: 30 vectors, dim 8, values in [-1, 1]
  private val dim = 8
  private val vecs: Seq[(Long, Seq[Float])] = (0L until 30L).map { i =>
    (i, (0 until dim).map { j =>
      (((i * 31 + j * 17) % 200) - 100) / 100.0f
    })
  }

  private def quant(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toArray

  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  /** Sequential greedy MMR reference. */
  private def ref(queryId: Long, k: Int): Seq[(Long, Long, Long, Long)] = {
    val q = vecs.map { case (i, v) => (i, quant(v)) }.toMap
    val qv = q(queryId)
    val pool = vecs.map(_._1).filter(_ != queryId)
    var selected = List.empty[Array[Long]]
    var selIds = Set.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)]
    for (t <- 1 to k) {
      val cands = pool.filterNot(selIds)
      val scored = cands.map { i =>
        val rel = dot(qv, q(i))
        val red = if (selected.isEmpty) 0L
          else selected.map(c => dot(c, q(i))).max
        (i, rel, red)
      }
      val (wi, wrel, wred) = scored.minBy { case (i, rel, red) =>
        (-(rel - red), i) }
      out += ((t.toLong, wi, wrel, wred))
      selected = q(wi) :: selected
      selIds += wi
    }
    out.toSeq
  }

  test("diverseTopK matches the sequential greedy reference") {
    val df = vecs.toDF("vec_id", "embedding")
    val got = Mmr.diverseTopK(df, col("vec_id"), col("embedding"),
        queryId = 0L, k = 8)
      .orderBy("sel_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === ref(0L, 8))
  }

  test("rank 1 is the pure-relevance argmax with red = 0; mmr " +
      "column is rel - red") {
    val df = vecs.toDF("vec_id", "embedding")
    val rows = Mmr.diverseTopK(df, col("vec_id"), col("embedding"),
        queryId = 3L, k = 5)
      .orderBy("sel_rank").collect()
    assert(rows.head.getAs[Long]("red") === 0L)
    rows.foreach { r =>
      assert(r.getAs[Long]("mmr") ===
        r.getAs[Long]("rel") - r.getAs[Long]("red"))
    }
    // selected ids are distinct and never the query
    val ids = rows.map(_.getAs[Long]("id"))
    assert(ids.distinct.length === ids.length)
    assert(!ids.contains(3L))
  }

  test("diverseTopK is invariant under partitioning and returns the " +
      "whole pool when k exceeds it") {
    val small = vecs.take(5).toDF("vec_id", "embedding")
    val a = Mmr.diverseTopK(small.repartition(1), col("vec_id"),
      col("embedding"), 0L, 10).collect().map(_.toSeq).toSeq
    val b = Mmr.diverseTopK(small.repartition(7), col("vec_id"),
      col("embedding"), 0L, 10).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.length === 4) // pool of 5 minus the query vector
  }
}
