package graft

import org.scalatest.funsuite.AnyFunSuite

/** Day-gap semantics of the rolling-WAU spine (round-13 adversarial-
  * sweep target): the sf fixtures have events on every day, so the
  * oracle gate never exercises a GAP day. The declared contract — the
  * output is keyed by OBSERVED days only, so a day with zero events
  * vanishes from BOTH dau and wau (not just dau, which would leave a
  * phantom wau row from the ×7 replication) — is pinned here on a
  * planted-gap frame, for both the exact query (q_rolling_wau) and
  * hand-computed window contents.
  */
class WauSpineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("gap days vanish from both dau and wau; windows span gaps") {
    // observed days 0, 1, 5, 9: gaps at 2-4 and 6-8; day 9's window
    // [3,9] must still see day-5 users ACROSS the gap
    val ud = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L),          // day 0: users 1,2,3
      (1L, 2L), (1L, 4L),                    // day 1: users 2,4
      (5L, 5L), (5L, 1L),                    // day 5: users 5,1
      (9L, 6L)                               // day 9: user 6
    ).toDF("day", "user_id")
    val out = BatchQueries.rollingWauFrom(ud)
      .as[(Long, Long, Long)].collect().toSeq
    val expected = Seq(
      (0L, 3L, 3L),            // window [-6,0]: users {1,2,3}
      (1L, 2L, 4L),            // window [-5,1]: users {1,2,3,4}
      (5L, 2L, 5L),            // window [-1,5]: days 0,1,5 → {1,2,3,4,5}
      (9L, 1L, 3L))            // window [3,9]: days 5,9 → {5,1,6}
    assert(out === expected)
    // no phantom rows for the gap days (2-4, 6-8) or the 7-day tails
    // past day 9 that the explode(sequence) replication generates
    assert(out.map(_._1) === Seq(0L, 1L, 5L, 9L))
  }

  test("single observed day: dau == wau, one row") {
    val ud = Seq((3L, 10L), (3L, 11L)).toDF("day", "user_id")
    val out = BatchQueries.rollingWauFrom(ud)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((3L, 2L, 2L)))
  }
}
