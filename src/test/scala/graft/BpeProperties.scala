package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.Bpe

/** ScalaCheck pin: Bpe.train equals the sequential greedy trainer on
  * random small-alphabet corpora — tiny alphabets maximize repeated
  * pairs and overlap chains ("aaaa…"), the exact cases where the
  * relational run-parity rule could drift from greedy.
  */
object BpeProperties extends Properties("Bpe") {
  private lazy val spark = TestSpark.spark

  private val wordGen: Gen[String] = for {
    n <- Gen.choose(1, 10)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val textGen: Gen[String] = for {
    n <- Gen.choose(1, 8)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  /** The BpeSpec reference trainer, duplicated in miniature: greedy
    * left-to-right apply, (freq desc, l, r) argmax, stop below 2.
    */
  private def refTrain(texts: Seq[String],
      rounds: Int): Seq[(Long, String, String)] = {
    var words: Seq[Vector[String]] = texts
      .flatMap(_.split("[ \t\n\r\f]+").filter(_.nonEmpty))
      .map(_.map(_.toString).toVector)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      words.foreach(_.sliding(2).filter(_.size == 2).foreach { p =>
        counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + 1L
      })
      if (counts.isEmpty || counts.values.max < 2L) done = true
      else {
        val ((l, rr), _) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r.toLong, l, rr))
        words = words.map { w =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < w.length) {
            if (i + 1 < w.length && w(i) == l && w(i + 1) == rr) {
              b += (l + rr); i += 2
            } else { b += w(i); i += 1 }
          }
          b.result()
        }
        r += 1
      }
    }
    out.toSeq
  }

  property("train equals the sequential greedy trainer on random " +
      "{a,b,c} corpora") =
    Prop.forAll(Gen.listOfN(4, textGen)) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Bpe.train(df, col("doc_id"), col("text"), rounds = 3)
        .orderBy("round").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      got == refTrain(texts, 3)
    }
}
