package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-time windowing semantics pins — especially the session-window
  * boundary case the oracle must mirror exactly.
  */
class EventWindowSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("tumbling windows are epoch-aligned") {
    val df = Seq((0L, 1L), (3599999999L, 2L), (3600000000L, 3L))
      .toDF("us", "id")
      .withColumn("tsm", timestamp_micros(col("us")))
      .groupBy(window(col("tsm"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("w.start")).as("b"), col("cnt"))
      .orderBy("b")
      .as[(Long, Long)].collect().toSeq
    assert(df === Seq((0L, 2L), (3600000000L, 1L)))
  }

  test("session window: diff == gap still MERGES; diff == gap+1 splits") {
    val gapUs = 60L * 1000000L // 1 minute
    //   a: 0                  -> session 1
    //   b: gapUs (diff == gap) -> MERGES (Spark's merge is inclusive:
    //      next.start <= prev.end) — the oracle's break must be > gap
    //   c: 2*gapUs + 1 (diff == gap+1) -> new session
    val rows = Seq((1L, 0L), (1L, gapUs), (1L, 2 * gapUs + 1))
    val out = rows.toDF("k", "us")
      .withColumn("tsm", timestamp_micros(col("us")))
      .groupBy(session_window(col("tsm"), "1 minute").as("w"), col("k"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("w.start")).as("start"), col("cnt"))
      .orderBy("start")
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((0L, 2L), (2 * gapUs + 1, 1L)))
  }
}
