package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Triangles

/** Goldens + brute-force cross-check for degree-oriented triangle
  * counting.
  */
class TrianglesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def profile(edges: Seq[(Long, Long)]) =
    Triangles.nodeProfile(edges.toDF("a", "b"))
      .select(col("node"), col("deg"), col("triangles"), col("clustering"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq

  test("K4: every node has 3 triangles and clustering 1.0") {
    val k4 = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    val out = profile(k4)
    assert(out === (0L to 3L).map(n => (n, 3L, 3L, 1.0)))
  }

  test("a path has no triangles; clustering 0 everywhere") {
    val out = profile(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(out.forall(r => r._3 === 0L && r._4 === 0.0))
    assert(out.map(_._2) === Seq(1L, 2L, 2L, 1L))
  }

  test("triangle with a pendant: counts and coefficients") {
    // 0-1-2 triangle, 3 hangs off 0
    val out = profile(Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L)))
    assert(out === Seq(
      (0L, 3L, 1L, 2.0 / 6.0),
      (1L, 2L, 1L, 1.0),
      (2L, 2L, 1L, 1.0),
      (3L, 1L, 0L, 0.0)))
  }

  test("random graph matches brute-force triple enumeration") {
    val rnd = new scala.util.Random(11)
    val n = 40
    val edges = (for { i <- 0 until n; j <- (i + 1) until n
      if rnd.nextDouble() < 0.15 } yield (i.toLong, j.toLong)).toSeq
    val es = edges.toSet
    def adj(x: Long, y: Long) = es.contains((math.min(x, y), math.max(x, y)))
    val triPerNode = (0L until n.toLong).map { v =>
      v -> (for { x <- 0L until n.toLong; y <- (x + 1) until n.toLong
        if x != v && y != v && adj(v, x) && adj(v, y) && adj(x, y) }
        yield 1).size.toLong
    }.toMap
    val out = profile(edges)
    out.foreach { case (node, deg, tri, coef) =>
      assert(tri === triPerNode(node), s"triangles at $node")
      val expDeg = edges.count(e => e._1 == node || e._2 == node).toLong
      assert(deg === expDeg)
      val expCoef = if (deg >= 2)
        (tri * 2L).toDouble / (deg * (deg - 1)).toDouble else 0.0
      assert(coef === expCoef)
    }
  }

  test("coPurchaseEdges dedups and orders pairs") {
    val df = Seq((1L, 10L), (1L, 20L), (1L, 10L), (1L, 30L),
      (2L, 20L), (2L, 10L)).toDF("o", "p")
    val out = Triangles.coPurchaseEdges(df, "o", "p")
      .as[(Long, Long)].collect().sortBy(identity).toSeq
    assert(out === Seq((10L, 20L), (10L, 30L), (20L, 30L)))
  }

  test("coPurchaseEdges minSupport keeps only repeated co-occurrences") {
    val df = Seq((1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (3L, 10L), (3L, 20L)).toDF("o", "p")
    val out = Triangles.coPurchaseEdges(df, "o", "p", minSupport = 2)
      .as[(Long, Long)].collect().sortBy(identity).toSeq
    assert(out === Seq((10L, 20L))) // (10,30)/(20,30) occur once only
  }
}
