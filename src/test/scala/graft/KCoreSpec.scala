package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KCore

/** Goldens + brute-force cross-check for bounded-round k-core peeling. */
class KCoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def peel(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    KCore.peel(edges.toDF("a", "b"), k, rounds)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  /** Reference peel: iterate delete-degree-<k to a fixpoint. */
  private def brutePeel(edges: Seq[(Long, Long)], k: Int)
      : Seq[(Long, Long)] = {
    var es = edges
    var changed = true
    while (changed) {
      val deg = es.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != es.size
      es = next
    }
    es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).toSeq
      .map { case (n, xs) => (n, xs.size.toLong) }.sortBy(_._1)
  }

  test("triangle with a pendant: the pendant peels off at k=2") {
    val out = peel(Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L)), k = 2,
      rounds = 2)
    assert(out === Seq((0L, 2L), (1L, 2L), (2L, 2L)))
  }

  test("a path cascades away entirely at k=2") {
    // each round exposes new endpoints of degree 1: needs the cascade
    val out = peel(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)), k = 2,
      rounds = 4)
    assert(out.isEmpty)
  }

  test("rounds=0 returns the input degree table") {
    val out = peel(Seq((0L, 1L), (1L, 2L)), k = 5, rounds = 0)
    assert(out === Seq((0L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("extra rounds after convergence are no-ops") {
    val k4 = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    val edges = k4.toSeq ++ Seq((0L, 9L)) // pendant off the clique
    assert(peel(edges, k = 3, rounds = 1) === peel(edges, k = 3, rounds = 5))
  }

  test("random graph matches the fixpoint brute force at enough rounds") {
    val rnd = new scala.util.Random(23)
    val n = 60
    val edges = (for { i <- 0 until n; j <- (i + 1) until n
      if rnd.nextDouble() < 0.06 } yield (i.toLong, j.toLong)).toSeq
    // n rounds is always an upper bound on peel depth
    assert(peel(edges, k = 3, rounds = n) === brutePeel(edges, k = 3))
  }
}
