package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{GramSetCount, PunctCount, SubtokenCount, WordSetCount}
import graft.operators.TextStats

/** The parity contract of the single-pass text-scan kernels: each
  * kernel must equal its regexp_count formulation (which the DuckDB
  * oracles still run) on arbitrary input, including the fixture's
  * real text. Adversarial inputs: multi-space runs, punctuation
  * clusters, digits glued to letters, stopwords at string edges,
  * overlapping gram positions.
  */
object TextScanProperties extends Properties("TextScan") {
  private lazy val spark = TestSpark.spark

  private val stopwords = TextStats.stopwordProfiles.head._2
  private val grams = TextStats.charNgramProfiles.head._2

  private val fragmentGen: Gen[String] = Gen.oneOf(
    Gen.alphaStr.map(_.take(6)),
    Gen.numStr.map(_.take(3)),
    Gen.oneOf("the", "a", "of", "to", "and", "in", "is", "that"),
    Gen.oneOf(".", ",,", "!?", "#", "_", "a_b", "x9y", "th", "he", "ther",
      "anin", "  ", "\t", "\n", ""))

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 30)
    parts <- Gen.listOfN(n, fragmentGen)
    sep <- Gen.oneOf("", " ", "  ")
  } yield parts.mkString(sep)

  private def kernelVsRegex(texts: List[String]): Prop = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val out = df.select(
        Bridge.column(PunctCount(Bridge.expression(col("text")))).as("k_p"),
        regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("long").as("r_p"),
        Bridge.column(SubtokenCount(Bridge.expression(col("text")))).as("k_s"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))
          .cast("long").as("r_s"),
        Bridge.column(WordSetCount(Bridge.expression(col("text")), stopwords))
          .as("k_w"),
        regexp_count(col("text"),
          lit("\\b(" + stopwords.mkString("|") + ")\\b")).cast("long").as("r_w"),
        Bridge.column(GramSetCount(Bridge.expression(lower(col("text"))), grams))
          .as("k_g"),
        regexp_count(lower(col("text")),
          lit("(" + grams.mkString("|") + ")")).cast("long").as("r_g"))
      .collect()
    Prop.all(out.map { r =>
      Prop(r.getLong(0) == r.getLong(1) && r.getLong(2) == r.getLong(3) &&
        r.getLong(4) == r.getLong(5) && r.getLong(6) == r.getLong(7)) :|
        s"row $r"
    }.toIndexedSeq: _*)
  }

  property("kernels equal regexp_count on generated adversarial text") =
    Prop.forAll(Gen.listOfN(8, textGen))(kernelVsRegex)

  property("kernels equal regexp_count on the sf0.001 documents") = {
    import spark.implicits._
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").as[String].collect().toList
    kernelVsRegex(texts)
  }
}
