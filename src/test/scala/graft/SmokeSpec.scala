package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes EVERY declared query end-to-end on sf0.001 — catches
  * analysis-time failures of custom expressions before they ship
  * (round-1 ADVICE: three declared queries had never run).
  */
class SmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries entry has an executable plan and returns rows") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { if (fn(spark, dir).count() > 0) None else Some(s"$name: 0 rows") }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(150)}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("oracleSql keys are a subset of queries keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }
}
