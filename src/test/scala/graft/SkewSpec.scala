package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted two-phase aggregation must equal the plain aggregation
  * exactly, including under pathological skew.
  */
class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("saltedCountSum equals plain groupBy on a 99%-one-key skew") {
    val rows = Seq.tabulate(10000)(i =>
      (if (i % 100 == 0) i.toLong % 7 else 42L, (i % 97) / 10.0))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedCountSum(df, col("k"), col("v"), salt = 16)
      .select(col("_key").as("k"), col("cnt"), col("sum_cents"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("v") * 100).cast("long")).as("sum_cents"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(salted === plain)
  }

  test("salted result is stable across salt factors") {
    val df = Seq.tabulate(1000)(i => (i % 3L, i.toDouble)).toDF("k", "v")
    val at = (s: Int) => Skew.saltedCountSum(df, col("k"), col("v"), salt = s)
      .orderBy("_key").collect().map(_.toSeq).toSeq
    assert(at(2) === at(64))
  }
}
