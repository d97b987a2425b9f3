package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MarketBasket

/** Brute-force reference for the A-Priori pair rules. */
class MarketBasketSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("pairRules matches brute force on a random basket set") {
    val rng = new scala.util.Random(3)
    val rows = Seq.fill(400)((rng.nextInt(30).toLong, rng.nextInt(12).toLong))
    val df = rows.toDF("basket", "item")
    val out = MarketBasket
      .pairRules(df, col("basket"), col("item"), minSupport = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

    val bi = rows.distinct
    val baskets = bi.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n = baskets.size.toLong
    val supp = bi.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val items = supp.keys.toSeq.sorted
    val brute = for {
      a <- items; b <- items if a < b
      ab = baskets.values.count(s => s(a) && s(b)).toLong if ab >= 2
    } yield (a, b, ab, supp(a), supp(b),
      ab * 1000000L / supp(a), ab * 1000000L / supp(b),
      ab * n * 1000000L / (supp(a) * supp(b)))
    assert(out === brute)
    // Sanity: a pair occurring in every basket containing a has
    // conf_ab = 1e6 exactly.
    assert(out.forall(r => r._6 <= 1000000L && r._8 > 0L))
  }

  test("duplicate (basket, item) rows don't inflate support") {
    val df = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L))
      .toDF("basket", "item")
    val out = MarketBasket
      .pairRules(df, col("basket"), col("item"), minSupport = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // Pair (10,20) in both baskets; supports 2/2/2; n=2 → lift 1.
    assert(out === Seq((10L, 20L, 2L, 2L, 2L, 1000000L, 1000000L,
      1000000L)))
  }
}
