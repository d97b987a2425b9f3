package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Merge

/** MERGE/upsert semantics: update, insert, pass-through, null-safe. */
class MergeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "bal")

  test("matched rows update, unmatched changes insert, rest ride through") {
    val changes = Seq((2L, 99.0), (4L, 44.0)).toDF("k", "bal")
    val out = Merge.upsert(base, changes, "k", Seq("bal"))
      .select("k", "name", "bal")
      .as[(Long, Option[String], Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, Some("a"), 10.0), // untouched base
      (2L, Some("b"), 99.0), // updated
      (3L, Some("c"), 30.0), // untouched base
      (4L, None, 44.0))) // inserted — no base attributes
  }

  test("a null change value leaves the base value in place") {
    val changes = Seq((Some(1L), None: Option[Double]),
      (Some(3L), Some(3.5))).toDF("k", "bal")
    val out = Merge.upsert(base, changes, "k", Seq("bal"))
      .select("k", "bal").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 10.0), (2L, 20.0), (3L, 3.5)))
  }

  test("updateCols not present in changes are rejected") {
    val changes = Seq((2L, 99.0)).toDF("k", "bal")
    intercept[IllegalArgumentException] {
      Merge.upsert(base, changes, "k", Seq("name"))
    }
  }

  test("plans a single equi-join on the key — no cartesian fallback") {
    val changes = Seq((2L, 99.0)).toDF("k", "bal")
    val plan = Merge.upsert(base, changes, "k", Seq("bal"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }
}
