package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CharGramBuckets, Shingles}
import graft.operators.{Classifier, Sampling}

/** Hashed n-gram classifier inference and epoch-order interleaving:
  * kernel hash parity (incl. multi-byte code points), argmax
  * tie-breaks, partitioning invariance, and interleave balance.
  */
class ClassifierSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("CharGramBuckets hashes code-point trigrams like SQL substr/md5") {
    // ✓ is a 3-byte UTF-8 code point: code-point grams differ from
    // byte or UTF-16 slicing here
    val text = "ab✓cd"
    val grams = Seq("ab✓", "b✓c", "✓cd")
    val expected = grams.map(g =>
      Shingles.md5Prefix60(UTF8String.fromString(g)) % 64)
    val got = Seq(text).toDF("t")
      .select(org.apache.spark.sql.graft.Bridge.column(
        CharGramBuckets(org.apache.spark.sql.graft.Bridge.expression(
          col("t")), 3, 64)).as("b"))
      .as[Seq[Long]].head()
    assert(got === expected)
    // and the md5 prefix itself matches Spark SQL's conv/md5 form
    val viaSql = grams.toDF("g")
      .selectExpr("cast(conv(substring(md5(g),1,15),16,10) as bigint) % 64")
      .as[Long].collect().toSeq
    assert(viaSql === expected)
  }

  test("short or null text yields no feature rows, not a crash") {
    val df = Seq((1L, "ab"), (2L, null), (3L, "abcd")).toDF("doc_id", "text")
    val out = Classifier.hashNgramPredict(df, col("doc_id"), col("text"))
    assert(out.select("id").as[Long].collect().toSet === Set(3L))
  }

  test("prediction is the argmax with ties to the lowest class id") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val scores = {
      // recompute all class scores relationally and take the argmax
      // independently of the operator's struct-min trick
      val feats = df.select(col("doc_id"),
          explode(org.apache.spark.sql.graft.Bridge.column(CharGramBuckets(
            org.apache.spark.sql.graft.Bridge.expression(lower(col("text"))),
            3, 64))).as("b"))
        .groupBy("doc_id", "b").count()
      feats.collect().flatMap { r =>
        (0 until 3).map { c =>
          val w = Shingles.md5Prefix60(
            UTF8String.fromString(s"w:$c:${r.getLong(1)}")) % 7 - 3
          ((r.getLong(0), c.toLong), w * r.getLong(2))
        }
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    }
    val expected = scores.groupBy(_._1._1).map { case (doc, m) =>
      val best = m.toSeq.map { case ((_, c), s) => (s, c) }
        .sortBy { case (s, c) => (-s, c) }.head
      (doc, best._2, best._1)
    }.toSet
    val got = Classifier.hashNgramPredict(df, col("doc_id"), col("text"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
    // partitioning invariance
    val again = Classifier.hashNgramPredict(df.repartition(5),
      col("doc_id"), col("text")).as[(Long, Long, Long)].collect().toSet
    assert(again === got)
  }

  test("epochOrder interleaves sources round-robin with dense positions") {
    val df = (0L until 90L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val out = Sampling.epochOrder(df, col("doc_id"), col("source"))
      .select("doc_id", "source", "epoch_rn", "epoch_pos")
      .as[(Long, String, Long, Long)].collect().sortBy(_._4)
    // positions are dense 0..n-1
    assert(out.map(_._4).toSeq === (0L until 90L))
    // every window of 3 consecutive positions holds all 3 sources
    // (equal-size sources -> perfect round-robin)
    out.grouped(3).foreach { g =>
      assert(g.map(_._2).toSet === Set("src0", "src1", "src2"))
    }
    // per-source ranks are dense 0..29
    out.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq === (0L until 30L))
    }
    // partitioning invariance
    val again = Sampling.epochOrder(df.repartition(7), col("doc_id"),
        col("source"))
      .select("doc_id", "source", "epoch_rn", "epoch_pos")
      .as[(Long, String, Long, Long)].collect().sortBy(_._4)
    assert(again.toSeq === out.toSeq)
  }
}
