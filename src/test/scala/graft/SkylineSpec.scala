package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Skyline, TermStats}

/** Brute-force dominance check for the 2-D skyline and hand-computed
  * goldens for the bigram-LM conditional surprisal. */
class SkylineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("frontier2 equals the brute-force non-dominated point set") {
    val rng = new scala.util.Random(7)
    val pts = Seq.fill(300)((rng.nextInt(40).toDouble, rng.nextInt(40)))
    val df = pts.toDF("price", "size")
    val out = Skyline.frontier2(df, col("price"), col("size"))
      .as[(Double, Int)].collect().sortBy(_._1).toSeq

    // Brute force over the distinct-value model: (x, y) is on the
    // frontier iff no point has smaller-or-equal x and >= y with one
    // strict — for the reduced per-x-max set this is "no smaller x
    // reaches >= y".
    val perX = pts.groupBy(_._1).map { case (x, ps) =>
      (x, ps.map(_._2).max)
    }.toSeq.sortBy(_._1)
    val brute = perX.filter { case (x, y) =>
      !perX.exists { case (x2, y2) => x2 < x && y2 >= y }
    }
    assert(out === brute)
    // Frontier y values strictly increase with x.
    assert(out.map(_._2) === out.map(_._2).sorted.distinct)
  }

  test("frontier2 drops NULL dimensions and keeps max y per tied x") {
    val df = Seq(
      (Some(1.0), Some(3)), (Some(1.0), Some(7)), // tie on x: keep 7
      (Some(2.0), Some(7)), // dominated (same y, bigger x)
      (Some(2.0), Some(9)),
      (None, Some(99)), (Some(0.5), None) // NULLs excluded
    ).toDF("price", "size")
    val out = Skyline.frontier2(df, col("price"), col("size"))
      .as[(Double, Int)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1.0, 7), (2.0, 9)))
  }

  test("bigramSurprisal hand-computed corpus") {
    // Corpus bigrams: "a b" x2 (doc1, doc2), "b a" x1, "a c" x1.
    // Prefix counts: a -> 3 ("a b" x2 + "a c"), b -> 1.
    // bits(3)=2, bits(2)=2, bits(1)=1.
    val df = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    val out = TermStats.bigramSurprisal(df, col("doc_id"), col("text"))
      .select(col("_id"), col("n_bigrams"), col("total_bits"),
        col("avg_centibits"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc1: bigrams "a b"(pre a: 2-2=0), "b a"(pre b: 1-1=0),
    //       "a c"(pre a: 2-1=1) -> total 1 bit over 3 bigrams = 33 cb
    // doc2: "a b" -> 0 bits over 1 bigram
    assert(out === Seq((1L, 3L, 1L, 33L), (2L, 1L, 0L, 0L)))
  }

  test("bigramSurprisal omits docs with fewer than two words") {
    val df = Seq((1L, "solo"), (2L, "x y")).toDF("doc_id", "text")
    val out = TermStats.bigramSurprisal(df, col("doc_id"), col("text"))
      .select(col("_id")).as[Long].collect().toSeq
    assert(out === Seq(2L))
  }
}
