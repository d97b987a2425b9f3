package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.PageRank

/** ScalaCheck properties for integer PageRank: on arbitrary random
  * directed graphs the distributed Pregel plan must equal a sequential
  * Map fold bit-for-bit (PageRankSpec pins hand-picked shapes; these
  * pin the contract on generated ones, including self-loops, parallel
  * edges, dangling nodes, and disconnected pieces).
  */
object PageRankProperties extends Properties("PageRank") {
  private lazy val spark = TestSpark.spark

  // each case runs 2 Spark iterations; 10 cases cover without bloating
  // wall clock
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 25)
    es <- Gen.listOfN(n,
      for {
        u <- Gen.choose(0L, 12L)
        v <- Gen.choose(0L, 12L)
      } yield (u, v))
  } yield es

  private def reference(edges: Seq[(Long, Long)], iters: Int,
      scale: Long): Map[Long, Long] = {
    val es = edges.distinct
    val deg = es.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val tele = 3L * scale / 20L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val c = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((u, v) <- es) c(v) += r(u) / deg(u)
      r = nodes.map(n => n -> (tele + 17L * c(n) / 20L)).toMap
    }
    r
  }

  property("distributed ranks equal the sequential fold") =
    forAll(edgesGen) { es =>
      import spark.implicits._
      val got = PageRank.ranks(es.toDF("s", "t").repartition(5),
          col("s"), col("t"), 2)
        .as[(Long, Long)].collect().toMap
      got == reference(es, 2, 1000000000000L)
    }
}
