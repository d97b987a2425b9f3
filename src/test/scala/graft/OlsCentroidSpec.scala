package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sanity checks for the OLS-regression and embedding-centroid queries
  * (their exactness gate is the DuckDB oracle; these pin the math).
  */
class OlsCentroidSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q_ols_group: slope/intercept reproduce a hand least-squares fit") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_ols_group")(spark, dir)
      .select("l_returnflag", "slope", "intercept", "r2")
      .as[(String, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    // recompute per group with plain Scala doubles
    val data = Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_quantity", "l_discount")
      .as[(String, Double, Double)].collect().groupBy(_._1)
    rows.foreach { case (g, slope, intercept, r2) =>
      val xs = data(g).map(_._2); val ys = data(g).map(_._3)
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val expSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(slope - expSlope) < 1e-9, s"slope($g)")
      assert(math.abs(intercept - (sy - expSlope * sx) / n) < 1e-9,
        s"intercept($g)")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12, s"r2($g)")
    }
  }

  test("q_embed_centroid: components average the per-label vectors") {
    import spark.implicits._
    val cent = SparkEntry.queries("q_embed_centroid")(spark, dir)
      .select("label", "pos", "n", "centroid")
      .as[(Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val vecs = Tables.embeddings(spark, dir)
      .select("label", "embedding")
      .as[(Int, Seq[Float])].collect()
    val byLabel = vecs.groupBy(_._1)
    byLabel.foreach { case (label, rows) =>
      val dim = rows.head._2.length
      (1 to dim).foreach { pos =>
        val xs = rows.map(_._2(pos - 1).toDouble)
        val (n, got) = cent((label, pos.toLong))
        assert(n === xs.length.toLong)
        val exp = xs.map(x => math.floor(x * 1e10 + 0.5)).sum /
          (xs.length.toDouble * 1e10)
        assert(math.abs(got - exp) < 1e-12, s"centroid($label, $pos)")
      }
    }
  }
}
