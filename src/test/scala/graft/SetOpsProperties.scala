package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Properties}

import graft.functions.SortedOverlapCount
import graft.operators.{Dedup, SetSimJoin}

/** ScalaCheck properties for the set-similarity kernels. */
object SetOpsProperties extends Properties("SetOps") {
  private lazy val spark = TestSpark.spark

  // each corpus case runs a full multi-stage Spark job — 15 cases give
  // the coverage without bloating the suite's wall clock
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val sortedDistinct: Gen[Array[Long]] =
    Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted.toArray)

  property("SortedOverlapCount equals Set intersection size") = {
    org.scalacheck.Prop.forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      val kernel = SortedOverlapCount(null, null)
        .compute(new GenericArrayData(a), new GenericArrayData(b))
      kernel == (a.toSet intersect b.toSet).size
    }
  }

  private val vocab = Vector("ww", "xx", "yy", "zz", "vv", "uu", "tt", "ss")
  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.choose(2, 10)
    docs <- Gen.listOfN(n,
      Gen.choose(6, 25).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield docs

  property("hashed shingles = xxhash64 of string shingles, elementwise") = {
    // THE invariant the whole fast path rests on: the hashed shingle
    // kernel must emit exactly what Spark's xxhash64 (seed 42) yields
    // on the string shingles, in the same first-occurrence order —
    // that is what makes MinHash signatures bit-identical across the
    // string and hashed inputs.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    org.scalacheck.Prop.forAll(corpusGen) { docs =>
      val both = docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "text")
        .select(
          Dedup.hashedShingles(col("text"), 2).as("h"),
          transform(Dedup.shingles(col("text"), 2), s => xxhash64(s)).as("e"))
        .as[(Seq[Long], Seq[Long])].collect()
      both.forall { case (h, e) => h == e }
    }
  }

  property("jaccardPairs equals brute force on random tiny-vocab corpora") = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // tiny vocab → heavily overlapping sets: the adversarial case for
    // prefix filtering (completeness must hold even when the filter
    // prunes nothing)
    org.scalacheck.Prop.forAll(corpusGen, Gen.oneOf(0.4, 0.6, 0.8)) { (docs, t) =>
      def grams(s: String): Set[(String, String)] =
        s.split(" ").toSeq.sliding(2).filter(_.size == 2)
          .map(w => (w(0), w(1))).toSet
      val expected = (for {
        (ta, ia) <- docs.zipWithIndex; (tb, ib) <- docs.zipWithIndex
        if ia < ib
        ga = grams(ta); gb = grams(tb)
        ovl = (ga intersect gb).size
        un = ga.size + gb.size - ovl
        if un > 0 && ovl.toDouble / un >= t
      } yield (ia.toLong, ib.toLong)).toSet
      val got = SetSimJoin.wordNgramJaccardPairs(
          docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
            .toDF("doc_id", "text"),
          col("doc_id"), col("text"), n = 2, threshold = t)
        .select("doc_a", "doc_b")
        .as[(Long, Long)].collect().toSet
      got == expected
    }
  }
}
