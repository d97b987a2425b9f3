package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LabelProp

/** LabelProp vs an in-memory reference implementation of the same
  * deterministic synchronous LPA (smallest-label tie-break). */
class LabelPropSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = adj.map { case (n, nbrs) =>
        val votes = nbrs.map(lab).groupBy(identity)
          .view.mapValues(_.size).toMap
        n -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    lab
  }

  test("two cliques joined by a bridge converge to two communities") {
    // Cliques {1,2,3} and {10,11,12}, bridge 3-10.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val out = LabelProp.propagate(edges.toDF("a", "b"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === brute(edges, 3))
    // Left clique settles on its min id; the right clique agrees on
    // one label too (3, leaked across the bridge — deterministic).
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 1L)
    assert(out(10L) === out(11L) && out(11L) === out(12L))
  }

  test("random graph matches the reference at rounds 0..3") {
    val rng = new scala.util.Random(11)
    val edges = Seq.fill(120) {
      val a = rng.nextInt(40).toLong
      val b = rng.nextInt(40).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val df = edges.toDF("a", "b")
    for (r <- 0 to 3) {
      val out = LabelProp.propagate(df, r)
        .as[(Long, Long)].collect().toMap
      assert(out === brute(edges, r), s"round count $r")
    }
  }
}
