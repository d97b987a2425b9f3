package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Typed Dataset API coverage (the KeyValueGroupedDataset family a
  * reference user switching to this library would reach for):
  * `cogroup` re-implements the as-of join per key and must agree with
  * the relational union+window operator row for row; `mapGroups`
  * agrees with the relational per-group aggregate. Also pins the
  * order-independence of the DECIMAL moment sums behind q_corr_group.
  */
class TypedApiSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("cogroup as-of == relational union+window as-of join") {
    val left = (0 until 500).map { i =>
      (i.toLong % 7, ((i * 131) % 997).toLong, i.toLong)
    }.toDF("k", "ts", "left_id")
    val right = (0 until 300).map { i =>
      (i.toLong % 7, ((i * 257) % 991).toLong, (i * 10).toDouble)
    }
      // unique (k, ts): keep max value per (k, ts)
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("k", "ts", "v")

    val relational = AsOfJoin.asof(left, right, "k", "ts", "v", "carried")
      .select("k", "ts", "left_id", "carried")
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._3).toSeq

    val typed = left.as[(Long, Long, Long)].groupByKey(_._1)
      .cogroup(right.as[(Long, Long, Double)].groupByKey(_._1)) {
        (k, ls, rs) =>
          val sortedR = rs.toArray.sortBy(_._2)
          ls.map { case (_, ts, id) =>
            // latest right with r.ts <= ts (binary-search-free scan is
            // fine at test size; semantics is what's under test)
            val at = sortedR.takeWhile(_._2 <= ts)
            (k, ts, id, at.lastOption.map(_._3))
          }
      }.collect().sortBy(_._3).toSeq
    assert(typed === relational)
  }

  test("mapGroups agrees with the relational per-group aggregate") {
    val df = (0 until 1000).map(i => (i % 13, i.toLong)).toDF("g", "v")
    val typed = df.as[(Int, Long)].groupByKey(_._1)
      .mapGroups { (g, it) =>
        val vs = it.map(_._2).toSeq
        (g, vs.size.toLong, vs.max)
      }.collect().sortBy(_._1).toSeq
    val relational = df.groupBy("g")
      .agg(count(lit(1)).as("n"), max("v").as("mx"))
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(typed === relational)
  }

  test("decimal moment sums are bit-identical under any input partitioning") {
    // the claim behind q_corr_group: DECIMAL accumulation makes the
    // aggregate independent of the partial-aggregation schedule —
    // double-sum results would differ in the last bits across layouts
    def run(parts: Int): Set[Seq[Any]] =
      Tables.lineitem(spark, "/root/testdata/sf0.001")
        .repartition(parts)
        .groupBy(col("l_returnflag"))
        .agg(
          sum((col("l_quantity") * col("l_discount")).cast("decimal(38,10)"))
            .cast("double").as("sxy"),
          sum(col("l_quantity").cast("decimal(38,10)")).cast("double")
            .as("sx"))
        .collect().map(_.toSeq).toSet
    assert(run(1) === run(13))
    assert(run(13) === run(32))
  }
}
