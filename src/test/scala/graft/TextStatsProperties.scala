package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.TextStats

/** ScalaCheck invariants for the text-analysis operators over
  * generated texts (letters, digits, punctuation, multi-space runs).
  */
object TextStatsProperties extends Properties("TextStats") {
  private lazy val spark = TestSpark.spark

  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(8)),
    Gen.numStr.suchThat(_.nonEmpty).map(_.take(4)),
    Gen.const("a,b!"), Gen.const("x."), Gen.const("the"))

  private val textGen: Gen[String] = for {
    n <- Gen.choose(1, 40)
    words <- Gen.listOfN(n, wordGen)
    sep <- Gen.oneOf(" ", "  ")
  } yield words.mkString(sep)

  private def stats(texts: List[String]) = {
    import spark.implicits._
    TextStats.addStats(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        col("text"))
      .select("doc_id", "n_chars", "n_tokens", "avg_token_len",
        "punct_ratio", "stopword_cnt", "n_subtokens")
      .collect()
  }

  property("stats invariants over generated texts") =
    Prop.forAll(Gen.listOfN(5, textGen)) { texts =>
      stats(texts).forall { r =>
        val nChars = r.getLong(1)
        val nTokens = r.getLong(2)
        val punct = r.getDouble(4)
        val subtok = r.getLong(6)
        nChars > 0 && nTokens >= 1 &&
          punct >= 0.0 && punct <= 1.0 &&
          subtok >= nTokens - 1 && // every non-space token has >=1 piece
          r.getLong(5) >= 0
      }
    }

  property("n_tokens equals the naive whitespace-split count") =
    Prop.forAll(Gen.listOfN(5, textGen)) { texts =>
      val out = stats(texts)
      texts.indices.forall { i =>
        out(i).getLong(2) == texts(i).split(TextStats.WsRegex).count(_ => true)
      }
    }

  property("U+000B vertical tab is NOT a token separator (explicit-class " +
      "contract: RE2 \\s excludes it, so the engine must too)") =
    Prop.forAll(Gen.const(())) { _ =>
      // "a<VT>b c" is TWO tokens under [ \t\n\r\f]+ in both engines
      // (Java \s+ would have made it three — the round-10 hash-gate
      // hazard this pins closed)
      stats(List("a\u000Bb c"))(0).getLong(2) == 2L
    }

  property("fingerprint is whitespace/case-canonical") =
    Prop.forAll(textGen) { text =>
      import spark.implicits._
      val variants = Seq(text, text.toUpperCase,
        text.replaceAll(TextStats.WsRegex, "  "))
      val fps = variants.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .select(TextStats.fingerprint(col("text")))
        .as[String].collect().toSet
      fps.size == 1
    }
}
