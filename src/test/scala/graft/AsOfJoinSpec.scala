package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Hand-computed goldens for the union+window as-of join. */
class AsOfJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("asof attaches the latest right value at or before each left ts") {
    val left = Seq((1L, 3L, "a"), (1L, 5L, "b"), (1L, 10L, "c"),
      (2L, 7L, "d"), (3L, 1L, "e"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 4L, 100.0), (1L, 10L, 200.0), (2L, 9L, 300.0))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.asof(left, right, "k", "ts", "v", "asof_v")
      .orderBy("k", "ts")
      .select("k", "ts", "tag", "asof_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3))))
    assert(out.toSeq === Seq(
      (1L, 3L, "a", None),          // before any right row
      (1L, 5L, "b", Some(100.0)),   // 4 <= 5
      (1L, 10L, "c", Some(200.0)),  // inclusive: 10 <= 10 beats 4
      (2L, 7L, "d", None),          // right at 9 is later
      (3L, 1L, "e", None)))         // key absent from right
  }

  test("result is partitioning-invariant") {
    val left = (0 until 500).map(i => (i % 7L, i.toLong, i)).toDF("k", "ts", "id")
    val right = (0 until 200).map(i => (i % 7L, i * 2L, i * 1.5)).toDF("k", "ts", "v")
    val run = (p: Int) => AsOfJoin.asof(left.repartition(p), right.repartition(p),
        "k", "ts", "v", "asof_v")
      .orderBy("k", "ts", "id").collect().map(_.toSeq).toSeq
    assert(run(1) === run(8))
  }
}
