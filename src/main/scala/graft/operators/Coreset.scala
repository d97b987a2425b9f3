package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.{LongDot, LongVecDot}

/** Greedy k-center coreset selection (Gonzalez 1985 farthest-point
  * traversal) over an embedding corpus — the "pick k maximally
  * diverse exemplars" primitive a training-data pipeline uses for
  * coverage-preserving subsampling, eval-set seeding, and
  * prototype/landmark selection (Sener & Savarese 2018 use exactly
  * this traversal for coreset-based active learning). The greedy
  * rule is a 2-approximation to the optimal k-center cover — the
  * best any polynomial algorithm achieves unless P=NP.
  *
  * Same exactness recipe as [[KMeans]]: embeddings quantize once to
  * integers (qᵢ = ⌊xᵢ·s + ½⌋), every distance is an exact 64-bit
  * squared L2 expanded as n(p) − 2·p·c + n(c) with [[LongDot]] /
  * [[LongVecDot]] codegen'd dots, and every selection tie breaks to
  * the lowest id — so the traversal is bit-identical on any
  * partitioning and fully replayable as relational SQL (the DuckDB
  * oracle unrolls the k−1 argmax steps as MATERIALIZED CTEs).
  *
  * Scale shape: the quantized corpus is persisted once; each of the
  * k−1 rounds is ONE narrow scan (a codegen'd t×dim dot block per
  * row computing the running min-distance to the t selected centers)
  * followed by a distributed top-1 (TakeOrdered — no global sort).
  * The selected centers are O(k·dim) driver-resident metadata, the
  * documented contract of [[KMeans]]'s centroid matrix and
  * [[Similarity]]'s IVF build. Total work k²·dim·n/2 dots — choose
  * k ≪ √(budget/n·dim); for corpus-scale k, switch to k-means++
  * style sampling (this operator is the exact small-k tool).
  *
  * Overflow contract (the [[KMeans]] one): |x| ≤ 1 ⇒ |q| ≤ s, so
  * dots and distances are ≤ 4·dim·s² — dim·s² < 2⁶² enforced.
  */
object Coreset {

  /** The quantized corpus (persisted) plus the selection sequence:
    * (rank, id, coverage dist, quantized vector).
    */
  private def traverse(emb: DataFrame, id: Column, vec: Column, k: Int,
      s: Long): (DataFrame, Seq[(Long, Long, Option[Long], Array[Long])]) = {
    require(k >= 1, "k must be >= 1")
    require(s >= 1L, "scale must be positive")
    val q = Bridge.persistRows(emb
      .filter(vec.isNotNull)
      .select(id.cast("long").as("id"),
        transform(vec, x => floor(x.cast("double") * s + lit(0.5))
          .cast("long")).as("q"))
      .withColumn("nq", Bridge.column(LongDot(
        Bridge.expression(col("q")), Bridge.expression(col("q"))))))

    val seedRows = q.orderBy(col("id")).limit(1).select("id", "q")
      .collect()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Option[Long], Array[Long])]
    if (seedRows.nonEmpty) {
      val dim = seedRows.head.getSeq[Long](1).length
      require(dim.toLong * s * s < (1L << 62),
        "dim * s^2 too large for exact 64-bit dots")
      var centers = List(seedRows.head.getSeq[Long](1).toArray)
      var selectedIds = Set(seedRows.head.getLong(0))
      out += ((1L, seedRows.head.getLong(0), None, centers.head))
      var t = 2
      var exhausted = false
      while (t <= k && !exhausted) {
        // running min over the t-1 selected centers, all exact: the
        // per-center distance is nq - 2*q·c + n(c) with c a reference
        // object, so the whole block codegens into the scan. Selected
        // ids are excluded (duplicate VECTORS are legitimate picks at
        // d=0, but a selected POINT must not repeat — this is also
        // what makes n < k return all n instead of looping)
        val d = centers.map(c => distTo(c)).reduce(least(_, _))
        // distributed top-1: farthest point, ties to the lowest id
        val win = q.filter(!col("id").isInCollection(selectedIds))
          .select(col("id"), col("q"), d.as("d"))
          .orderBy(col("d").desc, col("id")).limit(1).collect()
        if (win.isEmpty) exhausted = true
        else {
          val w = win.head
          val c = w.getSeq[Long](1).toArray
          out += ((t.toLong, w.getLong(0), Some(w.getAs[Long]("d")), c))
          centers = c :: centers
          selectedIds += w.getLong(0)
          t += 1
        }
      }
    }
    (q, out.toSeq)
  }

  /** Exact squared L2 distance of the scan row's `q`/`nq` columns to
    * the reference vector `c`.
    */
  private def distTo(c: Array[Long]): Column = {
    val nc = c.map(x => x * x).sum
    col("nq") - lit(2L) * Bridge.column(
      LongVecDot(Bridge.expression(col("q")), c.toSeq)) + lit(nc)
  }

  /** The k selected centers in selection order: one row per center,
    * (sel_rank 1..k, id, dist) with dist the exact integer squared
    * L2 distance from that center to the NEAREST previously-selected
    * center at the moment it was picked (the classic "coverage
    * radius" sequence — non-increasing; rank 1 is the deterministic
    * lowest-id seed and has dist NULL). If fewer than k vectors
    * exist, returns them all (rank ≤ n).
    */
  def kCenter(emb: DataFrame, id: Column, vec: Column, k: Int,
      s: Long = 1000L): DataFrame = {
    val (q, sel) = traverse(emb, id, vec, k, s)
    // k rows of driver metadata (the centroid-matrix contract) back
    // into a relation for the gate
    q.sparkSession.createDataFrame(
      q.sparkSession.sparkContext.parallelize(
        sel.map { case (r, i, dO, _) => Row(r, i, dO.orNull) }, 1),
      StructType(Seq(StructField("sel_rank", LongType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("dist", LongType, nullable = true))))
  }

  /** Every vector assigned to its nearest selected center — the
    * coverage clustering the traversal implies: (id, center_id,
    * dist), dist the exact squared L2 to the winning center, ties
    * broken to the lowest center id (so max(dist) over this relation
    * IS the k-center objective value). One extra narrow scan after
    * the traversal — the [[KMeans.assign]] argmin shape with the
    * selected centers as the cells.
    */
  def kCenterAssign(emb: DataFrame, id: Column, vec: Column, k: Int,
      s: Long = 1000L): DataFrame = {
    val (q, sel) = traverse(emb, id, vec, k, s)
    require(sel.nonEmpty, "kCenterAssign needs at least one vector")
    val cells = sel.map { case (_, cid, _, c) =>
      struct(distTo(c).as("dist"), lit(cid).as("center_id"))
    }
    val best = array_min(array(cells.toIndexedSeq: _*))
    q.select(col("id"),
      best.getField("center_id").as("center_id"),
      best.getField("dist").as("dist"))
  }
}
