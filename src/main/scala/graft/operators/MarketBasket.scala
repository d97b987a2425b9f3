package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise association rules — the A-Priori k=2 step (Agrawal &
  * Srikant, "Fast Algorithms for Mining Association Rules", VLDB
  * 1994): for every item pair co-occurring in at least `minSupport`
  * baskets, the joint support plus both directed confidences and the
  * lift, all in exact integer arithmetic (parts-per-million scaling,
  * `DIV` floor division) so the whole rule table is hash-gateable —
  * the same determinism-over-doubles choice as [[PageRank]].
  *
  * Shape: distinct (basket, item) → self-equi-join on the basket key
  * (replication bounded by items-per-basket², the classic candidate
  * generation cost; a degenerate mega-basket would route through
  * [[BucketPairs.boundedPairs]] exactly like the LSH bands — TPC-H-ish
  * baskets are single-digit so the direct join is the honest plan) →
  * pair-count aggregation (map-side combinable) → two equi-joins
  * against the item-support relation (|items| rows, never collected;
  * Spark broadcasts it when small) → one broadcast scalar (basket
  * count) for the lift denominator.
  *
  * Integer-range contract: `supp_ab · n_baskets · 1e6` must fit in
  * int64 — true whenever supp_ab · n < 9.2e12 (any bench scale; a
  * 100 TB run with billions of baskets drops the ppm scale to 1e3 or
  * moves the lift product to DECIMAL(38,0)).
  */
object MarketBasket {

  /** Rules over item pairs (a < b). Output: a, b, supp_ab, supp_a,
    * supp_b, conf_ab_ppm (= P(b|a) · 1e6, floored), conf_ba_ppm,
    * lift_ppm (= supp_ab·n / (supp_a·supp_b) · 1e6, floored).
    */
  def pairRules(df: DataFrame, basket: Column, item: Column,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val bi = df.select(basket.as("_o"), item.as("_i")).distinct()
    val n = bi.agg(count_distinct(col("_o")).as("_n"))
    val itemCnt = bi.groupBy(col("_i")).agg(count(lit(1)).as("supp"))
    bi.as("l")
      .join(bi.as("r"), col("l._o") === col("r._o") &&
        col("l._i") < col("r._i"))
      .groupBy(col("l._i").as("a"), col("r._i").as("b"))
      .agg(count(lit(1)).as("supp_ab"))
      .filter(col("supp_ab") >= minSupport)
      .join(itemCnt.select(col("_i").as("a"), col("supp").as("supp_a")),
        "a")
      .join(itemCnt.select(col("_i").as("b"), col("supp").as("supp_b")),
        "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("supp_ab"), col("supp_a"),
        col("supp_b"),
        expr("supp_ab * 1000000L DIV supp_a").as("conf_ab_ppm"),
        expr("supp_ab * 1000000L DIV supp_b").as("conf_ba_ppm"),
        expr("supp_ab * _n * 1000000L DIV (supp_a * supp_b)")
          .as("lift_ppm"))
  }
}
