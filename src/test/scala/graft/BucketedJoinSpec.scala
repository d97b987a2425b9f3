package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables — the co-located-join layout SCALE.md promises for
  * fact-to-fact joins at 100 TB: both sides pre-bucketed on the join
  * key into the same bucket count join WITHOUT any exchange (the
  * shuffle happened once, at write time, and is amortized over every
  * subsequent join).
  */
class BucketedJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans no exchange; values match the plain join") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "value")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"))

    val base = Files.createTempDirectory("graft-buckets").toString
    try {
      clicks.write.mode("overwrite")
        .option("path", s"$base/clicks")
        .bucketBy(8, "user_id").sortBy("user_id")
        .saveAsTable("graft_clicks_b")
      errors.write.mode("overwrite")
        .option("path", s"$base/errors")
        .bucketBy(8, "user_id").sortBy("user_id")
        .saveAsTable("graft_errors_b")

      // force the shuffle-join path (the fixture is small enough to
      // broadcast, which would hide the property under test: at fact
      // scale neither side broadcasts)
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_clicks_b")
        .join(spark.table("graft_errors_b"), "user_id")
      val p = joined.queryExecution.executedPlan.toString
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      // both sides bucketed on the join key with equal bucket counts:
      // the sort-merge join needs NO exchange on either side
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(400))
      assert(!p.contains("Exchange hashpartitioning"),
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))

      // and the result is exactly the plain join
      val expected = clicks.join(errors, "user_id")
        .groupBy()
        .agg(count(lit(1)).as("n"), sum("value").cast("long").as("s"))
        .collect().head
      val got = joined.groupBy()
        .agg(count(lit(1)).as("n"), sum("value").cast("long").as("s"))
        .collect().head
      assert(got === expected)
      assert(got.getLong(0) > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_clicks_b")
      spark.sql("DROP TABLE IF EXISTS graft_errors_b")
    }
  }
}
