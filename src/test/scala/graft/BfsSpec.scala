package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bfs

/** Frontier BFS vs a sequential reference: hop distances are exact
  * integers, so the distributed level-synchronous traversal must agree
  * with an in-memory queue BFS exactly, on any partitioning.
  */
class BfsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)], source: Long,
      maxDepth: Int): Map[Long, Long] = {
    val adj = edges.distinct.groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val dist = scala.collection.mutable.Map(source -> 0L)
    var frontier = Seq(source)
    var d = 1L
    while (frontier.nonEmpty && d <= maxDepth) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains)
      frontier.foreach(dist(_) = d)
      d += 1
    }
    dist.toMap
  }

  private def run(edges: Seq[(Long, Long)], source: Long, maxDepth: Int,
      parts: Int = 4): Map[Long, Long] =
    Bfs.distances(edges.toDF("s", "t").repartition(parts), col("s"),
        col("t"), source, maxDepth)
      .as[(Long, Long)].collect().toMap

  test("hand-computed: chain with a shortcut takes the shorter path") {
    // 1→2→3→4 plus shortcut 1→4: dist(4) must be 1, not 3
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    assert(run(e, 1L, 5) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("depth cap truncates; unreachable nodes are absent") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    assert(run(e, 1L, 2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // directed: no way back to 1 from anywhere
    assert(run(e, 4L, 5) === Map(4L -> 0L))
  }

  test("early stop on an exhausted frontier, random graph parity") {
    val rnd = new scala.util.Random(7)
    val e = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    for (depth <- Seq(1, 3, 8)) {
      assert(run(e, 0L, depth, parts = 7) === reference(e, 0L, depth))
    }
  }

  test("undirected semantics via symmetrized edges") {
    val e0 = Seq((1L, 2L), (3L, 2L), (3L, 4L))
    val e = e0 ++ e0.map(_.swap)
    assert(run(e, 4L, 10) ===
      Map(4L -> 0L, 3L -> 1L, 2L -> 2L, 1L -> 3L))
  }
}
