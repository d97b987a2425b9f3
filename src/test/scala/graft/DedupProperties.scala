package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.{Dedup, TextStats}

/** ScalaCheck properties for the dedup family over generated corpora
  * with injected duplicates.
  */
object DedupProperties extends Properties("Dedup") {
  private lazy val spark = TestSpark.spark

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.choose(3, 12)
    docs <- Gen.listOfN(n,
      Gen.choose(20, 60).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    dupOf <- Gen.choose(0, n - 1)
  } yield docs :+ docs(dupOf) // always at least one exact duplicate

  private def df(docs: List[String]) = {
    import spark.implicits._
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  property("exactDedup output is duplicate-free and keeps min ids") =
    Prop.forAll(corpusGen) { docs =>
      import spark.implicits._
      val kept = Dedup.exactDedup(
          df(docs).withColumn("fp", TextStats.fingerprint(col("text"))),
          col("fp"), col("doc_id"))
        .select("doc_id").as[Long].collect().toSet
      val expected = docs.zipWithIndex
        .groupBy(_._1).map(_._2.map(_._2).min.toLong).toSet
      kept == expected
    }

  property("nearDupPairs: jaccard in (0,1], ids ordered, exact dups found") =
    Prop.forAll(corpusGen) { docs =>
      import spark.implicits._
      val pairs = Dedup.nearDupPairs(df(docs), col("doc_id"), col("text"))
        .as[(Long, Long, Double)].collect()
      val dupPair = (docs.indexOf(docs.last).toLong, (docs.length - 1).toLong)
      pairs.forall { case (a, b, j) => a < b && j > 0.0 && j <= 1.0 } &&
        pairs.exists { case (a, b, j) => (a, b) == dupPair && j == 1.0 }
    }

  property("MinHashMod.mulmod equals BigInt modular arithmetic") = {
    import graft.functions.MinHashMod
    val aGen = Gen.choose(1L, MinHashMod.P - 1L)
    val hGen = Gen.choose(0L, (1L << 60) - 1L) // md5Prefix60 range
    Prop.forAll(aGen, hGen) { (a, h) =>
      MinHashMod.mulmod(a, h) ==
        ((BigInt(a) * BigInt(h)) mod BigInt(MinHashMod.P)).toLong
    }
  }

  property("mod-p signature components are each (a·minimizer+b) mod p " +
      "of SOME gram hash, and min over all grams") = {
    import graft.functions.MinHashMod
    val (as, bs) = MinHashMod.consts(16)
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, (1L << 60) - 1L))) { hs =>
      import spark.implicits._
      val got = Seq(Tuple1(hs)).toDF("h")
        .select(org.apache.spark.sql.graft.Bridge.column(
          graft.functions.MinHashSignatureMod(
            org.apache.spark.sql.graft.Bridge.expression(col("h")), 16))
          .as("sig"))
        .as[Seq[Long]].head()
      (0 until 16).forall { j =>
        val expect = hs.map { h =>
          val v = MinHashMod.mulmod(as(j), h) + bs(j)
          if (v >= MinHashMod.P) v - MinHashMod.P else v
        }.min
        got(j) == expect
      }
    }
  }

  property("nearDedup output is a subset of input containing no pair losers") =
    Prop.forAll(corpusGen) { docs =>
      import spark.implicits._
      val input = df(docs)
      val kept = Dedup.nearDedup(input, col("doc_id"), col("text"))
        .select("doc_id").as[Long].collect().toSet
      val losers = Dedup.nearDupPairs(input, col("doc_id"), col("text"))
        .select("doc_b").as[Long].collect().toSet
      kept.subsetOf(docs.indices.map(_.toLong).toSet) &&
        kept.intersect(losers).isEmpty &&
        (kept ++ losers) == docs.indices.map(_.toLong).toSet
    }
}
