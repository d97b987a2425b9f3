package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SetSimJoin

/** Exact n-gram Jaccard join: the prefix-filtered result must equal an
  * independent brute-force computation (Scala-side, no Spark) on every
  * corpus — completeness at the threshold is the operator's contract.
  */
class SetSimJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def grams(text: String, n: Int = 3): Set[String] =
    if (text.length < n) Set.empty
    else (0 to text.length - n).map(i => text.substring(i, i + n)).toSet

  private def bruteForce(docs: Seq[(Long, String)], t: Double)
      : Set[(Long, Long, Double)] = {
    val g = docs.map { case (id, txt) => id -> grams(txt) }
    (for {
      (ia, ga) <- g; (ib, gb) <- g if ia < ib
      ovl = (ga intersect gb).size
      un = ga.size + gb.size - ovl
      if un > 0 && ovl.toDouble / un >= t
    } yield (ia, ib, ovl.toDouble / un)).toSet
  }

  private def run(docs: Seq[(Long, String)], t: Double)
      : Set[(Long, Long, Double)] =
    SetSimJoin.ngramJaccardPairs(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        threshold = t)
      .as[(Long, Long, Double)].collect().toSet

  test("planted near-dups found with exact Jaccard values") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      0L -> base,
      1L -> base,                                // identical → J = 1.0
      2L -> (base + " tonight"),                 // near-dup
      3L -> "completely unrelated text about spark physical plans",
      4L -> "zz")                                // shorter than n → empty set
    val expected = bruteForce(docs, 0.6)
    assert(expected.exists(p => p._3 === 1.0), "fixture must plant an exact dup")
    assert(run(docs, 0.6) === expected)
  }

  test("matches brute force on a mixed corpus at several thresholds") {
    // templated corpus: clusters of small edits + unrelated tails
    val docs = (0L until 40L).map { i =>
      val cluster = i % 4
      val tail = if (i % 7 == 0) s" extra tail ${"pad " * (i.toInt % 3)}" else ""
      i -> (s"document template number $cluster repeated content body " +
        s"shared across the cluster variant ${i / 4}$tail")
    }
    for (t <- Seq(0.5, 0.75, 0.9))
      assert(run(docs, t) === bruteForce(docs, t), s"threshold $t")
  }

  private def wordGrams(text: String, n: Int): Set[Seq[String]] =
    text.split("\\s+").toSeq.sliding(n).filter(_.size == n).map(_.toSeq).toSet

  test("word-bigram path matches brute force (sizes and Jaccard values)") {
    val docs = Seq(
      0L -> "alpha beta gamma delta epsilon zeta eta theta",
      1L -> "alpha beta gamma delta epsilon zeta eta iota", // near-dup
      2L -> "alpha beta gamma delta epsilon zeta eta theta", // exact dup
      3L -> "totally different words in this one here now",
      4L -> "single")                                        // < n words
    val expected = (for {
      (ia, ga) <- docs.map { case (i, t) => i -> wordGrams(t, 2) }
      (ib, gb) <- docs.map { case (i, t) => i -> wordGrams(t, 2) }
      if ia < ib
      ovl = (ga intersect gb).size
      un = ga.size + gb.size - ovl
      if un > 0 && ovl.toDouble / un >= 0.6
    } yield (ia, ib, ovl.toDouble / un)).toSet
    val got = graft.operators.SetSimJoin
      .wordNgramJaccardPairs(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), n = 2, threshold = 0.6)
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.exists(_._3 === 1.0), "fixture must plant an exact dup")
    assert(got === expected)
  }

  test("result is invariant under repartitioning and bucketCap") {
    val docs = (0L until 30L).map { i =>
      i -> (s"shared template words for cluster ${i % 3} " +
        s"body content piece ${i / 3} tail")
    }
    val df = docs.toDF("doc_id", "text")
    val base = graft.operators.SetSimJoin
      .wordNgramJaccardPairs(df, col("doc_id"), col("text"),
        n = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val repart = graft.operators.SetSimJoin
      .wordNgramJaccardPairs(df.repartition(7), col("doc_id"), col("text"),
        n = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val tinyCap = graft.operators.SetSimJoin
      .wordNgramJaccardPairs(df, col("doc_id"), col("text"),
        n = 2, threshold = 0.5, bucketCap = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(base.nonEmpty)
    assert(repart === base)
    assert(tinyCap === base)
  }

  test("empty result when nothing qualifies; short docs never pair") {
    val docs = Seq(0L -> "alpha beta gamma", 1L -> "delta epsilon zeta",
      2L -> "ab", 3L -> "x")
    assert(run(docs, 0.9) === Set.empty)
  }

  private def wordGramStrs(text: String, n: Int): Set[String] = {
    val w = text.split("\\s+")
    if (w.length < n) Set.empty
    else (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" ")).toSet
  }

  test("containment matches brute force; finds subsumed quote Jaccard misses") {
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val host = ("iota kappa lambda mu nu xi omicron pi rho sigma tau " +
      "upsilon phi chi psi omega one two three four five six seven " +
      "eight nine ten ") + quote
    val docs = Seq(0L -> quote, 1L -> host,
      2L -> "totally different words entirely here now",
      3L -> quote.split(" ").take(6).mkString(" ")) // prefix of the quote
    val t = 0.8
    val out = SetSimJoin.wordNgramContainmentPairs(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        n = 3, threshold = t)
      .as[(Long, Long, Double)].collect().toSet
    val g = docs.map { case (id, txt) => id -> wordGramStrs(txt, 3) }
    val brute = (for {
      (ia, ga) <- g; (ib, gb) <- g if ia != ib && ga.nonEmpty
      c = (ga intersect gb).size.toDouble / ga.size if c >= t
    } yield (ia, ib, c)).toSet
    assert(out === brute)
    // The quote is fully inside the host (containment 1.0) while its
    // Jaccard against the host is far below any dedup threshold —
    // the case this operator exists for.
    assert(out.contains((0L, 1L, 1.0)))
    val ja = {
      val (ga, gb) = (g(0)._2, g(1)._2)
      (ga intersect gb).size.toDouble / (ga union gb).size
    }
    assert(ja < 0.3)
    // Directional: the big host is NOT contained in the quote.
    assert(!out.exists(p => p._1 == 1L && p._2 == 0L))
  }

  test("containment brute-force parity on a random mixed corpus") {
    val rng = new scala.util.Random(13)
    val vocab = Vector("a","b","c","d","e","f","g","h","i","j","k","l")
    val docs = (0L until 40L).map { id =>
      val len = 3 + rng.nextInt(25)
      id -> Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    for (t <- Seq(0.6, 0.8, 0.95)) {
      val out = SetSimJoin.wordNgramContainmentPairs(
          docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
          n = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      val g = docs.map { case (id, txt) => id -> wordGramStrs(txt, 3) }
      val brute = (for {
        (ia, ga) <- g; (ib, gb) <- g if ia != ib && ga.nonEmpty
        c = (ga intersect gb).size.toDouble / ga.size if c >= t
      } yield (ia, ib, c)).toSet
      assert(out === brute, s"threshold $t")
    }
  }
}
