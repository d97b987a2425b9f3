package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.LongVecDot

/** Maximal Marginal Relevance diverse top-k (Carbonell & Goldstein,
  * SIGIR 1998): iteratively select the candidate maximizing
  * λ·relevance − (1−λ)·max-similarity-to-already-selected — the
  * retrieval-diversity primitive for eval-set construction, RAG
  * context assembly, and "show k results that aren't five copies of
  * the same page" dedup-aware ranking.
  *
  * λ is fixed at 1/2, which makes the argmax objective the INTEGER
  * rel − redundancy (the common 2·score scaling): relevance is the
  * exact quantized dot with the query vector and redundancy the exact
  * max dot to the selected set — the [[KMeans]]/[[Coreset]] integer
  * recipe, so the whole traversal is bit-identical on any
  * partitioning and the DuckDB oracle unrolls it as MATERIALIZED CTE
  * rounds (argmax ties → lowest id).
  *
  * Scale shape ([[Coreset]]'s): the quantized pool is persisted once;
  * each of the k rounds is ONE narrow scan (a codegen'd t×dim dot
  * block computing the running max-redundancy) ending in a
  * distributed top-1 (TakeOrdered — no global sort); selected vectors
  * are O(k·dim) driver metadata. Total k²·dim·n/2 dots — the exact
  * small-k tool; corpus-scale diverse sampling is [[Coreset]] /
  * cluster-stratified sampling.
  *
  * Overflow contract: |x| ≤ 1 ⇒ |dot| ≤ dim·s², enforced < 2⁶².
  */
object Mmr {

  /** The k-selection sequence: (sel_rank 1..k, id, rel, red, mmr)
    * with rel the exact dot to `queryId`'s vector, red the exact max
    * dot to the previously-selected (0 for rank 1), mmr = rel − red
    * at the moment of selection. The query vector itself is excluded
    * from the pool. Returns fewer than k rows iff the pool is
    * smaller.
    */
  def diverseTopK(emb: DataFrame, id: Column, vec: Column, queryId: Long,
      k: Int, s: Long = 1000L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(s >= 1L, "scale must be positive")
    val q = Bridge.persistRows(emb
      .filter(vec.isNotNull)
      .select(id.cast("long").as("id"),
        transform(vec, x => floor(x.cast("double") * s + lit(0.5))
          .cast("long")).as("q")))
    val qRow = q.filter(col("id") === queryId).limit(1).collect()
    require(qRow.nonEmpty, s"query vector $queryId not found")
    val qv = qRow.head.getSeq[Long](1).toArray
    require(qv.length.toLong * s * s < (1L << 62),
      "dim * s^2 too large for exact 64-bit dots")

    def dotTo(c: Array[Long]): Column = Bridge.column(
      LongVecDot(Bridge.expression(col("q")), c.toSeq))

    val pool = q.filter(col("id") =!= queryId)
      .withColumn("rel", dotTo(qv))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)]
    var selected = List.empty[Array[Long]]
    var selIds = Set.empty[Long]
    var t = 1
    var exhausted = false
    while (t <= k && !exhausted) {
      val red =
        if (selected.isEmpty) lit(0L)
        else selected.map(dotTo).reduce(greatest(_, _))
      val win = pool.filter(!col("id").isInCollection(selIds + queryId))
        .select(col("id"), col("q"), col("rel"), red.as("red"))
        .orderBy((col("rel") - col("red")).desc, col("id")).limit(1)
        .collect()
      if (win.isEmpty) exhausted = true
      else {
        val w = win.head
        out += ((t.toLong, w.getLong(0), w.getAs[Long]("rel"),
          w.getAs[Long]("red")))
        selected = w.getSeq[Long](1).toArray :: selected
        selIds += w.getLong(0)
        t += 1
      }
    }
    val spark = emb.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq.map {
        case (r, i, rel, red) => Row(r, i, rel, red, rel - red)
      }, 1),
      StructType(Seq(
        StructField("sel_rank", LongType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("rel", LongType, nullable = false),
        StructField("red", LongType, nullable = false),
        StructField("mmr", LongType, nullable = false))))
  }
}
