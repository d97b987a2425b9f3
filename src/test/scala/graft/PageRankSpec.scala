package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** Integer PageRank vs an in-memory reference implementation: the
  * distributed Pregel-shaped plan and a sequential Map fold must agree
  * bit-for-bit (that exactness is the operator's whole point — see the
  * scaladoc on why the double formulation can't be gated).
  */
class PageRankSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)], iters: Int,
      scale: Long): Map[Long, Long] = {
    val es = edges.distinct
    val deg = es.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val tele = 3L * scale / 20L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val c = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((u, v) <- es) c(v) += r(u) / deg(u)
      r = nodes.map(n => n -> (tele + 17L * c(n) / 20L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
      parts: Int = 4): Map[Long, Long] =
    PageRank.ranks(edges.toDF("s", "t").repartition(parts), col("s"),
        col("t"), iters)
      .as[(Long, Long)].collect().toMap

  test("hand-computed two-node chain") {
    // 1→2 only: node 1 gets teleport alone, node 2 gets 1's whole rank
    val out = run(Seq((1L, 2L)), 1)
    assert(out === Map(
      1L -> 150000000000L,
      2L -> (150000000000L + 17L * 1000000000000L / 20L)))
  }

  test("matches the sequential reference on assorted graphs") {
    val graphs = Seq(
      // directed triangle
      Seq((1L, 2L), (2L, 3L), (3L, 1L)),
      // star: hub cited by all leaves, hub points back at one leaf
      Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L)),
      // two components + a parallel edge (must collapse) + a self-loop
      Seq((1L, 2L), (1L, 2L), (2L, 1L), (3L, 3L), (4L, 5L)),
      // bipartite-ish, uneven degrees
      (1L to 20L).map(i => (i, 100L + i % 3)) ++ Seq((100L, 1L),
        (101L, 1L), (102L, 2L)))
    for (g <- graphs; iters <- Seq(1, 3)) {
      assert(run(g, iters) === reference(g, iters, 1000000000000L),
        s"graph=$g iters=$iters")
    }
  }

  test("invariant under input partitioning") {
    val g = (1L to 30L).flatMap(i => Seq((i, i % 7), (i % 5, i)))
    assert(run(g, 3, parts = 1) === run(g, 3, parts = 13))
  }
}
