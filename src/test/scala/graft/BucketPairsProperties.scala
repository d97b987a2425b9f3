package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.BucketPairs

/** ScalaCheck properties for the skew-salting pair generator.
  *
  * SkewSpec stress-tests one adversarial shape (N identical docs in one
  * bucket); these properties pin the CONTRACT on random bucket contents
  * at adversarial caps: the emitted pair multiset equals the naive
  * (salt-free) self-join's — each unordered intra-bucket pair exactly
  * once per covering bucket, ids canonicalized, payloads carried with
  * the right member. cap=1 is the extreme where every sub-bucket is a
  * singleton and every pair must come from exactly one off-diagonal
  * cell.
  */
object BucketPairsProperties extends Properties("BucketPairs") {
  private lazy val spark = TestSpark.spark

  // each case runs a Spark job; 15 cases cover without bloating wall clock
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  /** bucket name -> distinct member ids (an id may sit in many buckets,
    * as LSH banding produces)
    */
  private val bucketsGen: Gen[List[(String, List[Long])]] = for {
    nb <- Gen.choose(1, 3)
    buckets <- Gen.sequence[List[(String, List[Long])], (String, List[Long])](
      (0 until nb).toList.map { b =>
        for {
          sz <- Gen.choose(0, 8)
          ids <- Gen.pick(sz, 0L until 20L)
        } yield (s"b$b", ids.toList)
      })
  } yield buckets

  private def run(buckets: List[(String, List[Long])], cap: Int): Boolean = {
    import spark.implicits._
    val rows = buckets.flatMap { case (bk, ids) => ids.map(id => (bk, id, id * 10)) }
    if (rows.isEmpty) true
    else {
      val got = BucketPairs
        .boundedPairs(rows.toDF("bk", "id", "pl"), Seq("bk"), "id", Seq("pl"), cap)
        .select("id_a", "id_b", "pl_a", "pl_b")
        .as[(Long, Long, Long, Long)].collect().toList
      val carried = got.forall { case (a, b, pa, pb) =>
        a < b && pa == a * 10 && pb == b * 10
      }
      val gotMultiset = got.map(t => (t._1, t._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val naive = buckets.flatMap { case (_, ids) =>
        for { a <- ids; b <- ids; if a < b } yield (a, b)
      }.groupBy(identity).view.mapValues(_.size).toMap
      carried && gotMultiset == naive
    }
  }

  property("pair multiset equals the naive self-join at cap in {1,2,3}") =
    forAll(bucketsGen, Gen.oneOf(1, 2, 3)) { (buckets, cap) => run(buckets, cap) }

  property("exactly-once per covering bucket at cap=1 (all cells singleton)") =
    forAll(bucketsGen) { buckets => run(buckets, cap = 1) }
}
