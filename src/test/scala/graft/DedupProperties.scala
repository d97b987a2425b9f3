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
