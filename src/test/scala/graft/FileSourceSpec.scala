package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** File-format source/sink breadth: the engine's tables are parquet,
  * but a complete library reads the other first-class Spark formats.
  * Each round-trip writes the events slice and reads it back with an
  * EXPLICIT schema (schema inference is a scan-the-data anti-pattern
  * at 100 TB) asserting exact value equality against the parquet
  * original.
  */
class FileSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def original = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "value")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id").collect().toSeq

  test("csv round-trip with header and explicit schema") {
    val out = Files.createTempDirectory("graft-csv").toString
    original.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    assert(rows(back) === rows(original))
  }

  test("json-lines round-trip with explicit schema") {
    val out = Files.createTempDirectory("graft-json").toString
    original.write.mode("overwrite").json(out)
    val back = spark.read.schema(schema).json(out)
    assert(rows(back) === rows(original))
  }

  test("orc round-trip (schema carried by the format)") {
    val out = Files.createTempDirectory("graft-orc").toString
    original.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema === StructType(schema.map(_.copy(nullable = true))))
    assert(rows(back) === rows(original))
  }

  test("csv filter pushes down to the scan") {
    val out = Files.createTempDirectory("graft-csv2").toString
    original.write.mode("overwrite").option("header", "true").csv(out)
    val p = spark.read.schema(schema).option("header", "true").csv(out)
      .filter(col("event_type") === "click")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"),
      p.linesIterator.filter(_.contains("FileScan")).mkString("\n"))
  }
}
