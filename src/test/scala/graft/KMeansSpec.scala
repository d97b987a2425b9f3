package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans

/** Integer-exact k-means + SemDeDup: partitioning invariance (the
  * property float Lloyd lacks), planted-cluster recovery, argmin
  * tie-breaks, degenerate inputs, and survivor selection.
  */
class KMeansSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Two tight planted clusters around opposite corners of dim-8
    * space, ids interleaved so seed ids (0, 1) land one per cluster.
    */
  private def planted = {
    val dim = 8
    (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 0.9f else -0.9f
      val jitter = (i % 5).toFloat / 100f
      (i, Array.fill(dim)(base + jitter))
    }.toDF("vec_id", "embedding")
  }

  test("assign recovers planted clusters and is partitioning-invariant") {
    val a = KMeans.assign(planted.repartition(1), col("vec_id"),
        col("embedding"), k = 2, rounds = 2)
      .select("id", "cluster", "dist")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = KMeans.assign(planted.repartition(13), col("vec_id"),
        col("embedding"), k = 2, rounds = 2)
      .select("id", "cluster", "dist")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
    // seeds are ids 0 (even/positive corner) and 1 (odd/negative):
    // every even id must share id 0's cluster, every odd id id 1's
    val byId = a.map(t => t._1 -> t._2).toMap
    assert(a.forall { case (id, cl, _) => cl === byId(id % 2) })
    assert(byId(0L) !== byId(1L))
  }

  test("distance ties break to the lowest cluster index") {
    // identical seed vectors: every point is equidistant to both
    // centroids in every round, so everything must sit in cluster 0
    val df = (0L until 10L).map(i => (i, Array.fill(4)(1.0f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.assign(df, col("vec_id"), col("embedding"),
      k = 2, rounds = 2)
    assert(out.select("cluster").as[Long].collect().forall(_ == 0L))
    // dist to the (identical) centroid is 0
    assert(out.select("dist").as[Long].collect().forall(_ == 0L))
  }

  test("a singleton outlier cluster stays locked on its seed across rounds") {
    // all mass at one corner except the id-1 seed: across two update
    // rounds the bulk centroid converges onto the mass while the far
    // singleton keeps its own seed centroid — membership must not
    // oscillate (the empty-cluster carry itself is exercised by the
    // identical-seed tie test above, where cluster 1 empties in
    // round 1 and must survive the round-2 update)
    val df = ((0L until 20L).map(i => (i * 2, Array.fill(4)(0.5f))) :+
      (1L, Array.fill(4)(-0.9f))).toDF("vec_id", "embedding")
    val out = KMeans.assign(df, col("vec_id"), col("embedding"),
        k = 2, rounds = 3)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    assert(out(1L) === 1L)
    assert(out.filter(_._1 != 1L).values.forall(_ == 0L))
  }

  test("semanticDedup keeps the lowest id of each planted dup group") {
    // pairs (10g, 10g+1) are identical one-hot vectors — same cluster,
    // cosine 1 — so the odd member of each pair must be dropped;
    // different groups are orthogonal (cosine 0), so nothing else is
    val dim = 32
    val df = (0L until 30L).flatMap { g =>
      val v = Array.tabulate(dim)(j => if (j == g.toInt) 1.0f else 0.0f)
      Seq((g * 10, v), (g * 10 + 1, v))
    }.toDF("vec_id", "embedding")
    val kept = KMeans.semanticDedup(df, col("vec_id"), col("embedding"),
        k = 4, rounds = 2, tPct = 90)
      .select("id").as[Long].collect().toSet
    assert((0L until 30L).forall(g => kept(g * 10)))
    assert((0L until 30L).forall(g => !kept(g * 10 + 1)))
  }

  test("ivfTopK finds a planted same-cluster neighbor at rank 1") {
    // id 100 is a near-copy of id 0: same k-means cell, cosine ~1, so
    // the IVF probe must surface it first among id 0's neighbors
    val dim = 8
    val base = Array.tabulate(dim)(j => if (j % 2 == 0) 0.9f else -0.7f)
    val near = base.clone(); near(0) = near(0) - 0.02f
    val rows = Seq((0L, base), (100L, near)) ++ (1L until 40L).map { i =>
      (i, Array.tabulate(dim)(j =>
        (((i * 13 + j * 7) % 19).toFloat - 9f) / 10f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = KMeans.ivfTopK(df, col("vec_id"), col("embedding"),
        Seq(0L), topK = 3, nprobe = 2, k = 4, rounds = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(out.find(_._2 == 1).map(_._1) === Some(100L))
    // invariant under partitioning
    val again = KMeans.ivfTopK(df.repartition(11), col("vec_id"),
        col("embedding"), Seq(0L), topK = 3, nprobe = 2, k = 4,
        rounds = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(again === out)
  }

  test("semanticDedup collapses parallel vectors even at tPct=99") {
    // every planted vector is CONSTANT (base + jitter in all dims), so
    // within a corner all vectors are parallel — cosine exactly 1
    // regardless of jitter. The correct SemDeDup verdict is one
    // survivor per direction: the lowest id of each corner (0 and 1).
    val kept = KMeans.semanticDedup(planted, col("vec_id"),
        col("embedding"), k = 2, rounds = 2, tPct = 99)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(0L, 1L))
  }
}
