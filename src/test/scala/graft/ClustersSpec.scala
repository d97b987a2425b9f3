package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Clusters

/** Connected components (large-star/small-star) must produce the
  * min-label-per-component fixpoint of the undirected graph — checked
  * against a local union-find on random graphs, on adversarial shapes
  * (paths, whose diameter forces multiple rounds; stars, already
  * converged), and under repartitioning.
  */
class ClustersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] =
    Clusters.connectedComponents(
        edges.toDF("a", "b").repartition(parts), col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def localUnionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // min-label: union-find with min-root union gives the min directly
    nodes.map(n => n -> find(n)).toMap
  }

  test("path graph labels every node with the path minimum") {
    val edges = (1L to 9L).map(i => (i, i + 1)) // diameter 9 forces rounds
    val got = cc(edges)
    assert(got === (1L to 10L).map(_ -> 1L).toMap)
  }

  test("two components plus self-loop noise") {
    val edges = Seq((5L, 3L), (3L, 8L), (20L, 21L), (21L, 20L), (7L, 7L))
    val got = cc(edges)
    assert(got === Map(3L -> 3L, 5L -> 3L, 8L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("already-star input converges immediately") {
    val edges = (2L to 30L).map(i => (i, 1L))
    assert(cc(edges) === ((1L to 30L).map(_ -> 1L).toMap))
  }

  test("random graphs match a local union-find") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 120
      val edges = Seq.fill(140)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(cc(edges) === localUnionFind(edges))
    }
  }

  test("labels are invariant under input partitioning") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(200)((rnd.nextInt(90).toLong, rnd.nextInt(90).toLong))
      .filter(e => e._1 != e._2)
    assert(cc(edges, parts = 1) === cc(edges, parts = 13))
  }

  test("dedupClusters: transitive chain collapses to one cluster, singleton survives") {
    // Single-token edits at positions 10 and 30 of a 40-token base:
    // jaccard(a,b) = jaccard(b,c) = 35/41 ≈ 0.85 >= 0.8, but
    // jaccard(a,c) = 32/44 ≈ 0.73 < 0.8 — a TRUE transitive chain
    // (a-c is not a direct pair). d is unrelated. Greedy pair-dropping
    // is order-dependent here; clustering must label {a,b,c} with the
    // min id 1 and d with itself.
    val base = (1 to 40).map(i => s"tok$i")
    val a = base.mkString(" ")
    val b = base.updated(10, "B").mkString(" ")
    val c = base.updated(10, "B").updated(30, "C").mkString(" ")
    val d = (1 to 40).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("doc_id", "text")
    val got = Clusters.dedupClusters(df, col("doc_id"), col("text"),
        threshold = 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }
}
