package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule: the idiomatic HOF dot product must be
  * rewritten to the DotProduct kernel, bit-for-bit result-preserving.
  */
class ExtensionRuleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y),
    lit(0.0), (acc, v) => acc + v)

  // Range-backed (NOT a local Seq: ConvertToLocalRelation would fold
  // the whole projection away at optimization time and hide the rule)
  private def df = spark.range(4).select(
    array(col("id").cast("double") * 1.5, lit(-2.25),
      col("id").cast("double") - 0.3).as("a"),
    array(lit(0.5), col("id").cast("double") * 4.0, lit(-1.25)).as("b"))

  test("HOF dot product is rewritten to the kernel and values are bit-equal") {
    // baseline WITHOUT the rule (shared session: another suite may have
    // registered it — remove explicitly)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == graft.plans.RewriteHofKernels)
    val before = df.select(hofDot.as("d")).as[Double].collect().toSeq

    GraftFunctions.register(spark)
    try {
      val after = df.select(hofDot.as("d"))
      val optimized = after.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dot_product"), optimized)
      assert(!optimized.contains("aggregate("), optimized)
      // same FP operation order → bit-identical doubles
      assert(after.as[Double].collect().toSeq === before)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.RewriteHofKernels)
    }
  }

  test("non-matching folds are left alone (sum without product, wrong zero)") {
    GraftFunctions.register(spark)
    try {
      val sumOnly = df.select(aggregate(col("a"), lit(0.0),
        (acc, v) => acc + v).as("s"))
      assert(!sumOnly.queryExecution.optimizedPlan.toString
        .contains("dot_product"))
      val wrongZero = df.select(aggregate(
        zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(1.0), (acc, v) => acc + v).as("d"))
      assert(!wrongZero.queryExecution.optimizedPlan.toString
        .contains("dot_product"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.RewriteHofKernels)
    }
  }
}
