package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.Quantiles

/** The sort-free two-pass rank gate vs the percent_rank window gate
  * over random grouped frames — heavy duplicate mass (small value
  * domain) so the boundary regularly lands INSIDE a tie class, random
  * gate fractions including 0, 1, and >1, and random partitioning.
  * The two derivations must agree on every row, every time.
  */
object RankGateProperties extends Properties("RankGateTwoPass") {
  private lazy val spark = TestSpark.spark

  private val frameGen: Gen[List[(String, Double, Long)]] = for {
    nGroups <- Gen.choose(1, 3)
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0, nGroups - 1).map(i => s"g$i")
      v <- Gen.choose(0, 4).map(_.toDouble) // tiny domain → fat ties
    } yield (g, v))
  } yield rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }

  private val fracGen: Gen[(Long, Long)] = Gen.oneOf(
    Gen.const((0L, 1L)), Gen.const((1L, 1L)), Gen.const((3L, 2L)),
    for { d <- Gen.choose(2L, 10L); nu <- Gen.choose(1L, d) } yield (nu, d))

  property("two-pass gate == window gate on random frames, fractions, " +
    "and partitionings") =
    Prop.forAll(frameGen, fracGen, Gen.choose(1, 5)) {
      case (rows, (num, den), parts) =>
        import spark.implicits._
        val df = rows.toDF("g", "v", "t").repartition(parts)
        val twoPass = Quantiles.rankGateTwoPass(df, col("g"), col("v"),
            col("t"), num, den)
          .as[(String, Long, Boolean)].collect().toMap2
        val w = Window.partitionBy(col("g")).orderBy(col("v"), col("t"))
        // double pr >= double frac is EXACT against the two-pass
        // integer inequality in this domain: distinct rationals with
        // denominators <= 59 and <= 10 differ by >= 1/590, far above
        // double rounding; equal rationals divide to the identical
        // double (IEEE division is correctly rounded)
        val frac = num.toDouble / den.toDouble
        val windowed = df
          .withColumn("kept",
            // single-row groups: pr = 0 by engine convention
            percent_rank().over(w) >= frac)
          .select(col("g"), col("t"), col("kept"))
          .as[(String, Long, Boolean)].collect().toMap2
        Prop(twoPass == windowed) :|
          s"num=$num den=$den diff=${
            (twoPass.toSet diff windowed.toSet) ++
              (windowed.toSet diff twoPass.toSet)}"
    }

  property("multi-fraction boundaries nest: kept(a/d) ⊇ kept(b/d) " +
    "for a <= b — the ccnetBuckets tercile invariant") =
    Prop.forAll(frameGen, Gen.choose(2L, 6L), Gen.choose(1, 4)) {
      case (rows, den, parts) =>
        import spark.implicits._
        val df = rows.toDF("g", "v", "t").repartition(parts)
        // derive every fraction's keep set through rankBoundary (the
        // round-15 multi-fraction path ccnetBuckets uses): keep sets
        // must be monotone in the fraction, or a bucket labeling
        // could emit contradictory labels (tail but not middle)
        val keeps = (0L to den).map { nu =>
          Quantiles.rankGateTwoPass(df, col("g"), col("v"), col("t"),
              nu, den)
            .as[(String, Long, Boolean)].collect()
            .filter(_._3).map(r => (r._1, r._2)).toSet
        }
        Prop(keeps.sliding(2).forall {
          case Seq(a, b) => b.subsetOf(a)
          case _ => true
        }) :| s"den=$den sizes=${keeps.map(_.size)}"
    }

  private implicit class Tup3Ops(rows: Array[(String, Long, Boolean)]) {
    def toMap2: Map[(String, Long), Boolean] =
      rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}
