package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Bfs

/** ScalaCheck properties for frontier BFS: on arbitrary random directed
  * graphs the distributed level-synchronous traversal must equal a
  * sequential queue BFS exactly — including self-loops, parallel edges,
  * unreachable components, sources with no out-edges, and any
  * partitioning (BfsSpec pins hand-picked shapes; these pin the
  * contract on generated ones).
  */
object BfsProperties extends Properties("Bfs") {
  private lazy val spark = TestSpark.spark

  // each case runs up to `depth` Spark rounds; keep the count modest
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val caseGen: Gen[(List[(Long, Long)], Long, Int, Int)] = for {
    n <- Gen.choose(1, 40)
    es <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 14L)
      v <- Gen.choose(0L, 14L)
    } yield (u, v))
    src <- Gen.choose(0L, 14L)
    depth <- Gen.choose(0, 5)
    parts <- Gen.choose(1, 7)
  } yield (es, src, depth, parts)

  private def reference(edges: Seq[(Long, Long)], source: Long,
      maxDepth: Int): Map[Long, Long] = {
    val adj = edges.distinct.groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val dist = scala.collection.mutable.Map(source -> 0L)
    var frontier = Seq(source)
    var d = 1L
    while (frontier.nonEmpty && d <= maxDepth) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains)
      frontier.foreach(dist(_) = d)
      d += 1
    }
    dist.toMap
  }

  property("distributed distances == sequential queue BFS on random " +
      "graphs, any depth/partitioning") =
    forAll(caseGen) { case (es, src, depth, parts) =>
      import spark.implicits._
      val got = Bfs.distances(
          es.toDF("s", "t").repartition(parts), col("s"), col("t"),
          src, depth)
        .as[(Long, Long)].collect().toMap
      got == reference(es, src, depth)
    }
}
