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

  test("HLL union by register-wise max IS the sketch of the combined " +
      "slice (merge exactness), and the overlap matrix audits hold") {
    import spark.implicits._
    import graft.operators.CardSketch
    // two overlapping synthetic slices
    val a = (1 to 300).map(i => ("a", s"tok$i"))
    val b = (200 to 500).map(i => ("b", s"tok$i"))
    val df = (a ++ b).toDF("src", "w")
    val mBits = 6
    val regs = CardSketch.hllRegistersBy(df, col("src"), col("w"), mBits)
    // register-wise max across the two groups
    val merged = regs.groupBy(col("bucket"))
      .agg(max(col("max_rho")).as("max_rho"))
      .select("bucket", "max_rho")
      .as[(Long, Long)].collect().toMap
    // sketch of the concatenated slice, built directly
    val direct = CardSketch.hllRegisters(
        df.select(col("w")), col("w"), mBits)
      .as[(Long, Long)].collect().toMap
    assert(merged === direct,
      "union-by-max must equal the directly-built union sketch")
    // the q_hll_overlap exact-audit invariants on the real fixture:
    // intersection bounded by the smaller side, inclusion-exclusion
    // union arithmetic internally consistent, est_union dominated by
    // the estimate sum (inclusion-exclusion sanity)
    val rows = SparkEntry.queries("q_hll_overlap")(spark, dir)
      .select("n_a_exact", "n_b_exact", "n_inter_exact",
        "n_union_exact", "est_a", "est_b", "est_union")
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect()
    assert(rows.length === 190)
    rows.foreach { case (na, nb, ni, nu, ea, eb, eu) =>
      assert(ni <= math.min(na, nb) && nu === na + nb - ni)
      assert(eu <= ea + eb + 1e-9, s"union est $eu above sum $ea+$eb")
    }
  }
}
