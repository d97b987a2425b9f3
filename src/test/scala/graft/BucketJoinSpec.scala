package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located joins — the storage-level answer to "the
  * same big-big join runs every day": write both fact tables bucketed
  * (and sorted) on the join key once, and every subsequent equi-join
  * on that key plans with ZERO Exchange on both sides, because the
  * on-disk layout IS the join partitioning. At 100 TB this turns the
  * recurring orders⋈lineitem shuffle (the single most expensive stage
  * of every TPC-H-shaped query here) into a map-side merge — the
  * pre-shuffled layout is amortized across every downstream run.
  *
  * The zero-exchange property is asserted against the physical plan
  * (broadcast disabled so the small fixture can't cheat the
  * demonstration), and the bucketed join's RESULT is pinned equal to
  * the plain shuffle join in exact integers.
  */
class BucketJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def cleanup(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
  }

  test("bucketed+sorted tables join with zero exchanges on either " +
      "side; result == shuffle join (exact integers)") {
    cleanup()
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"),
          round(col("l_quantity")).cast("long").as("q"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
      Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")

      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(col("q")).as("sq"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      // the join must not shuffle either side: the only exchange
      // allowed is the groupBy ABOVE the join, so the section BELOW
      // the SortMergeJoin must be exchange-free
      val joinSection = plan.split("SortMergeJoin").drop(1).mkString
      assert(!joinSection.contains("Exchange"),
        "bucketed join re-shuffled a side:\n" + plan.take(1500))

      // result parity with the plain shuffle join, exact integers
      val shuffled = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"),
          round(col("l_quantity")).cast("long").as("q"))
        .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(col("q")).as("sq"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val bucketed = j.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(bucketed === shuffled)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      cleanup()
    }
  }

  test("one-side-bucketed join: the unbucketed side aligns to the " +
      "BUCKET count (not spark.sql.shuffle.partitions), bucket side " +
      "stays exchange-free through AQE (round-12 sweep target)") {
    // The hazard: shuffle.partitions is 32 and AQE coalesces
    // exchanges at runtime, while the bucketed layout is pinned at 8.
    // If the engine ever shuffled the unbucketed side to 32 (or let
    // AQE coalesce it away from 8), the join would need a SECOND
    // exchange on the bucketed side — exactly the shuffle the layout
    // exists to amortize away. Spark must plan ONE exchange, on the
    // probe side, hash-partitioned to the bucket count, and AQE must
    // leave it at 8 in the final plan.
    cleanup()
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"),
          round(col("l_quantity")).cast("long").as("q"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
      val j = spark.table("b_lineitem")
        .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("q"))
      j.collect() // let AQE finalize
      // the adaptive plan string carries BOTH "== Final Plan ==" and
      // "== Initial Plan ==" sections — count exchanges in the final
      // one only
      val plan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("isFinalPlan=true"), plan.take(300))
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      val joinSection = plan.split("SortMergeJoin").drop(1).mkString
      val exchanges = "Exchange hashpartitioning\\([^)]*, (\\d+)\\)".r
        .findAllMatchIn(joinSection).map(_.group(1).toInt).toSeq
      assert(exchanges === Seq(8),
        s"want exactly one probe-side exchange at the bucket count, " +
          s"got $exchanges:\n" + plan.take(1500))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      cleanup()
    }
  }
}
