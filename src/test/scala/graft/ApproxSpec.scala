package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy bounds for the approximate sketch paths — rows-only at
  * the oracle gate (engine-specific sketches by design), so the
  * error contract is pinned here against the exact computations.
  */
class ApproxSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct lands within 3x the default rsd of exact") {
    val approx = Tables.events(spark, dir).groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, dir).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, e) =>
      val rel = math.abs(approx(k) - e).toDouble / e
      assert(rel <= 3 * 0.05, s"$k: approx=${approx(k)} exact=$e rel=$rel")
    }
  }

  test("percentile_approx at high accuracy equals an exact-rank element") {
    // with accuracy >= group size the KLL-style sketch is lossless:
    // the result must be an actual data value at the right rank zone
    val vals = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("value")).as[Double](org.apache.spark.sql.Encoders.scalaDouble)
      .collect().sorted
    val approx = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .agg(percentile_approx(col("value"), lit(0.5), lit(1000000)).as("m"))
      .collect().head.getDouble(0)
    val n = vals.length
    // exact-rank neighborhood (either side of the median position)
    val window = vals.slice(math.max(0, n / 2 - 2), math.min(n, n / 2 + 3))
    assert(window.contains(approx),
      s"approx median $approx not in exact-rank window ${window.mkString(",")}")
  }
}
