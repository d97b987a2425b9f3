package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** Goldens + brute-force cross-check for the blocked Levenshtein
  * self-join.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)], maxDist: Int,
      cap: Int = 1000) =
    FuzzyJoin.selfJoin(rows.toDF("id", "name", "blk"), col("id"),
        col("name"), Seq("blk" -> col("blk")), maxDist, cap)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().sortBy(p => (p._1, p._2)).toSeq

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("finds close pairs inside a block and orders ids") {
    val out = run(Seq((2L, "kitten", "x"), (1L, "sitten", "x"),
      (3L, "kittten", "x")), maxDist = 1)
    assert(out === Seq((1L, 2L, 1), (2L, 3L, 1)))
  }

  test("identical names in different blocks are never paired") {
    val out = run(Seq((1L, "same", "x"), (2L, "same", "y")), maxDist = 0)
    assert(out.isEmpty)
  }

  test("maxDist=0 keeps only exact matches") {
    val out = run(Seq((1L, "aa", "x"), (2L, "aa", "x"), (3L, "ab", "x")),
      maxDist = 0)
    assert(out === Seq((1L, 2L, 0)))
  }

  test("a degenerate block under a tiny cap still emits each pair once") {
    val rows = (1L to 30L).map(i => (i, s"name$i", "hot"))
    val out = run(rows, maxDist = 10, cap = 3)
    val expect = (for { a <- 1L to 30L; b <- (a + 1) to 30L
      d = lev(s"name$a", s"name$b") if d <= 10 } yield (a, b, d)).toSeq
    assert(out === expect.sortBy(p => (p._1, p._2)))
  }

  test("random strings match the brute-force blocked join") {
    val rnd = new scala.util.Random(31)
    def word() = (0 until 3 + rnd.nextInt(6))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val rows = (1L to 80L).map(i => (i, word(), s"b${rnd.nextInt(3)}"))
    val byBlk = rows.groupBy(_._3)
    val expect = byBlk.values.flatMap { rs =>
      for { x <- rs; y <- rs if x._1 < y._1
        d = lev(x._2, y._2) if d <= 2 } yield (x._1, y._1, d)
    }.toSeq.sortBy(p => (p._1, p._2))
    assert(run(rows, maxDist = 2) === expect)
  }
}
