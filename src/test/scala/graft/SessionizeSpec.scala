package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize

/** Gap-sessionization boundary semantics and the binned interval
  * join's exactly-once contract (a pair meeting in two bins would
  * double-count — the probe-bin-uniqueness argument is pinned here
  * against a brute-force oracle under bin widths smaller, equal, and
  * larger than the interval spans).
  */
class SessionizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("gap strictly-greater starts a new session; equal gap does not") {
    val ev = Seq((1L, 0L), (1L, 10L), (1L, 20L), // gaps = gap → same
      (1L, 31L), // gap 11 > 10 → new
      (2L, 5L) // other user independent
    ).toDF("u", "ts")
    val out = Sessionize.sessionize(ev, col("u"), col("ts"), gapUs = 10L)
      .select("u", "ts", "session_seq")
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(out === Seq((1L, 0L, 1L), (1L, 10L, 1L), (1L, 20L, 1L),
      (1L, 31L, 2L), (2L, 5L, 1L)))
  }

  test("sessionStats bounds cover first/last event per session") {
    val ev = Seq((1L, 0L), (1L, 5L), (1L, 100L)).toDF("u", "ts")
    val out = Sessionize.sessionStats(ev, col("u"), col("ts"), gapUs = 10L)
      .select("user_id", "session_seq", "n_events", "t_start", "t_end")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(out === Seq((1L, 1L, 2L, 0L, 5L), (1L, 2L, 1L, 100L, 100L)))
  }

  test("countContaining == brute force for any bin width (exactly-once)") {
    // deterministic pseudo-random probes and intervals
    val probes = (0 until 200).map(i => (i.toLong, ((i * 7919) % 997).toLong))
    val ivals = (0 until 60).map { i =>
      val s = ((i * 104729) % 900).toLong
      (s, s + ((i * 31) % 200).toLong)
    }
    val expected = probes.map { case (pid, ts) =>
      pid -> ivals.count { case (s, e) => s <= ts && ts <= e }.toLong
    }.toMap
    for (bin <- Seq(7L, 100L, 1000L, 5000L)) {
      val got = Sessionize.countContaining(
          probes.toDF("event_id", "ts"), col("event_id"), col("ts"),
          ivals.toDF("s", "e"), col("s"), col("e"), binUs = bin)
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"bin=$bin")
    }
  }

  test("zero-match probes survive with count 0") {
    val got = Sessionize.countContaining(
        Seq((1L, 50L)).toDF("id", "ts"), col("id"), col("ts"),
        Seq((100L, 200L)).toDF("s", "e"), col("s"), col("e"), binUs = 10L)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L)))
  }
}
