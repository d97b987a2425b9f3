package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join reduction (a.k.a. runtime filtering /
  * semi-join pushdown): for a shuffle join whose build side is made
  * selective by a filter, Catalyst can inject a Bloom filter built
  * from the build side's join keys UNDER the probe side's scan, so
  * the big side drops non-joining rows before the shuffle — at 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling the ~matching slice. Off by default; this spec pins that
  * the engine's session can turn it on and that injection actually
  * fires (plan carries the bloom aggregate + might_contain probe) and
  * preserves results.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def withRuntimeFilter[A](f: => A): A = {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local fixtures are far below the production-size thresholds —
      // zero them so the rule fires at test scale
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1000GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom runtime filter injects under the probe scan and preserves results") {
    val dir = "/root/testdata/sf0.01"
    def query() = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_totalprice") > lit(400000.0)),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))

    val plain = query().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    withRuntimeFilter {
      val df = query()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilter"),
        s"expected an injected bloom filter in:\n${optimized.take(3000)}")
      val filtered = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(filtered === plain)
    }
  }

  test("parquet aggregate pushdown serves COUNT/MIN/MAX from footer metadata") {
    val dir = "/root/testdata/sf0.01"
    // only the V2 parquet scan supports aggregate pushdown — the V1
    // FileScan ignores it silently
    val confs = Seq("spark.sql.parquet.aggregatePushdown" -> "true",
      "spark.sql.sources.useV1SourceList" -> "")
    val old = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val df = spark.read.parquet(s"$dir/lineitem.parquet")
        .agg(count(lit(1)).as("cnt"), min(col("l_quantity")).as("mn"),
          max(col("l_quantity")).as("mx"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"),
        s"aggregate not pushed to the scan:\n${plan.take(1200)}")
      val r = df.collect().head
      val expected = Tables.lineitem(spark, dir)
        .agg(count(lit(1)), min(col("l_quantity")), max(col("l_quantity")))
        .collect().head
      assert(r.getLong(0) === expected.getLong(0))
      assert(r.getDouble(1) === expected.getDouble(1))
      assert(r.getDouble(2) === expected.getDouble(2))
    } finally old.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
  }
}
