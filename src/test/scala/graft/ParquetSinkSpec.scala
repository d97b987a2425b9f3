package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned parquet sink + partition-pruned read-back: the layout
  * pattern a 100 TB pipeline lives on — a filter on the partition
  * column must prune directories at planning time (zero I/O for
  * non-matching partitions), not scan-and-discard.
  */
class ParquetSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("hive-partitioned write; read-back prunes partitions and round-trips") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = Files.createTempDirectory("graft-psink").toString
    val ev = Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "value")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

    val back = spark.read.parquet(out)
    val clicks = back.filter(col("event_type") === "click")

    // partition pruning is a planning-time property: the scan's
    // partition filters must carry the predicate...
    val scan = clicks.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty)
    assert(scan.head.partitionFilters.exists(_.toString.contains("event_type")),
      scan.head.partitionFilters.mkString(", "))

    // values round-trip exactly
    val expected = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "value")
      .orderBy("event_id").collect().toSeq
    val got = clicks.select("event_id", "user_id", "value")
      .orderBy("event_id").collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty)

    // ...and after execution the scan read ONLY the matching
    // directory's files (numFiles metric vs the on-disk listing)
    clicks.collect()
    val clickFiles = new java.io.File(s"$out/event_type=click")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val allFiles = new java.io.File(out).listFiles()
      .filter(_.isDirectory)
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    val readFiles = clicks.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.head
    assert(readFiles === clickFiles)
    assert(clickFiles < allFiles, "fixture must have multiple partitions")
  }
}
