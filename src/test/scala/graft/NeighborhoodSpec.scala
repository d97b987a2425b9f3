package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CardSketch, Neighborhood}

/** HyperBall register diffusion must equal sketching each vertex's
  * TRUE r-ball directly — max-merge along edges is exactly union of
  * the underlying sets at the register level — and the resulting
  * estimates must track real ball sizes.
  */
class NeighborhoodSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential r-ball membership over a directed edge list. */
  private def balls(edges: Seq[(Long, Long)],
      r: Int): Map[Long, Set[Long]] = {
    val adj = edges.distinct.groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    nodes.map { n =>
      var ball = Set(n)
      for (_ <- 1 to r)
        ball = ball ++ ball.flatMap(adj.getOrElse(_, Set.empty))
      n -> ball
    }.toMap
  }

  private def diffused(edges: Seq[(Long, Long)], r: Int,
      parts: Int = 5): Map[Long, (Long, Long)] =
    Neighborhood.ballDenominators(
        edges.toDF("s", "t").repartition(parts), col("s"), col("t"), r)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap

  private def direct(ballSet: Map[Long, Set[Long]]): Map[Long, (Long, Long)] = {
    val exploded = ballSet.toSeq
      .flatMap { case (n, b) => b.map(m => (n, m)) }
      .toDF("node", "member")
    CardSketch.hllDenominatorBy(
        CardSketch.hllRegistersBy(exploded, col("node"),
          col("member").cast("string"), 4),
        col("_grp"), 4)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
  }

  test("diffusion == direct sketch of the true ball (register-exact), " +
      "rounds 1 and 2, directed and symmetrized") {
    val rnd = new scala.util.Random(11)
    val e = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2).distinct
    for (r <- Seq(1, 2)) {
      assert(diffused(e, r) === direct(balls(e, r)), s"directed r=$r")
    }
    val sym = e ++ e.map(_.swap)
    assert(diffused(sym, 2) === direct(balls(sym, 2)), "symmetrized r=2")
  }

  test("estimates track true ball sizes in aggregate") {
    val rnd = new scala.util.Random(19)
    val e0 = Seq.fill(600)(
      (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter(p => p._1 != p._2).distinct
    val e = e0 ++ e0.map(_.swap)
    val den = diffused(e, 2, parts = 8)
    val truth = balls(e, 2)
    val alpha = 0.673
    val est = den.map { case (n, (_, s)) =>
      n -> alpha * 16 * 16 * math.pow(2.0, 57) / s.toDouble }
    val meanTrue = truth.values.map(_.size).sum.toDouble / truth.size
    val meanEst = est.values.sum / est.size
    assert(math.abs(meanEst / meanTrue - 1.0) < 0.3,
      s"aggregate estimate $meanEst too far from $meanTrue")
  }
}
