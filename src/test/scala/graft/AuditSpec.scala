package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Audit, Dedup}

/** Observation-based pipeline counters: exact values, one execution. */
class AuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("funnel counters match per-stage counts from ONE action") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"))
    val stages: Seq[(String, DataFrame => DataFrame)] = Seq(
      "exact_dedup" -> (df =>
        Dedup.exactDedup(df, md5(col("text")), col("doc_id"))),
      "lang_en" -> (_.filter(col("lang") === "en")),
      "min_len" -> (_.filter(length(col("text")) >= 100)))
    val (out, read) = Audit.funnel(docs, stages,
      extras = Seq(sum(length(col("text"))).as("chars")))

    // ONE action fills every stage's counters
    val finalRows = out.count()
    val metrics = read()
    assert(metrics.map(_._1) === Seq("exact_dedup", "lang_en", "min_len"))

    // cross-check against independently recomputed per-stage counts
    val s1 = Dedup.exactDedup(docs, md5(col("text")), col("doc_id"))
    val s2 = s1.filter(col("lang") === "en")
    val s3 = s2.filter(length(col("text")) >= 100)
    val expected = Seq(s1, s2, s3).map(df =>
      (df.count(), df.agg(sum(length(col("text")))).as[Long].head()))
    metrics.zip(expected).foreach { case ((name, m), (n, chars)) =>
      assert(m("rows") === n, s"$name rows")
      assert(m("chars") === chars, s"$name chars")
    }
    assert(finalRows === expected.last._1)
  }

  test("observe rides a noop write (the bench/production action)") {
    val (df, obs) = Audit.observe(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      "scan_audit",
      Seq(count(lit(1)).as("rows"),
        sum((length(col("text")) >= 100).cast("long")).as("long_docs")))
    df.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("rows").asInstanceOf[Long] > 0L)
    assert(m.contains("long_docs"))
  }
}
