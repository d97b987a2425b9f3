package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-materialization contract (round-4 verdict finding #1).
  *
  * `df.count()` lets Catalyst rewrite the plan under `count(1)`:
  * unreferenced projections are pruned (ColumnPruning), sorts removed
  * (EliminateSorts), and window operators whose output nobody reads are
  * collapsed — a rank-window query degenerates to a bare parquet scan
  * count, so timing it measures scan speed, not the declared work.
  * `Bench` therefore materializes through the built-in `noop` sink,
  * which consumes every output column.
  *
  * These tests capture the ACTUALLY-EXECUTED plan via a
  * QueryExecutionListener under both execution paths and assert the
  * noop write retains the Window node exactly where count() drops it.
  */
class BenchPlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Runs `action`, returns the executed-plan strings of every query
    * execution observed by the listener while it ran.
    */
  private def executedPlans(action: => Unit): Seq[String] = {
    val plans = scala.collection.concurrent.TrieMap.empty[Long, String]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.put(qe.id, qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      action
      // listener callbacks are delivered asynchronously on the
      // listener bus; poll until at least one plan lands
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (plans.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      plans.values.toSeq
    } finally spark.listenerManager.unregister(listener)
  }

  test("count() prunes the rank window — why Bench must not time it") {
    val df = SparkEntry.queries("q_rank_fns")(spark, dir)
    val counted = executedPlans { df.count(): Unit }
    assert(counted.nonEmpty)
    assert(!counted.exists(_.contains("Window")),
      "expected count(1) to collapse the window; the bench-fidelity " +
        "premise changed — re-audit Bench materialization:\n" + counted.mkString("\n---\n"))
  }

  test("noop-sink write (what Bench times) retains the Window node") {
    val df = SparkEntry.queries("q_rank_fns")(spark, dir)
    val written = executedPlans {
      df.write.format("noop").mode("overwrite").save()
    }
    assert(written.nonEmpty)
    assert(written.exists(_.contains("Window")),
      "noop write lost the Window node — Bench no longer measures the " +
        "declared work:\n" + written.mkString("\n---\n"))
  }

  test("noop-sink write retains the global sort count() eliminates") {
    // q_ind_full ends in an orderBy consumed by Verify's parquet write;
    // EliminateSorts removes it under count(1).
    val df = SparkEntry.queries("q_ind_full")(spark, dir)
    val written = executedPlans {
      df.write.format("noop").mode("overwrite").save()
    }
    assert(written.exists(p => p.contains("Sort") && p.contains("Window")),
      written.mkString("\n---\n"))
  }
}
