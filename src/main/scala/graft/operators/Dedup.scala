package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline.
  *
  * Exact dedup is a keyed window (one shuffle on the fingerprint).
  * Near-dedup is banded MinHash-LSH: shingle → k minhashes → b band
  * keys → equi-join on band key → exact-Jaccard verification of the
  * candidates. NEVER all-pairs: the only join key is the band hash, so
  * work scales with bucket sizes (collisions), not n² — the design
  * holds at 100 TB where a cross join would not. All stages are
  * built-in codegen'd expressions (higher-order functions + xxhash64);
  * determinism comes from fixed integer seeds.
  */
object Dedup {

  /** Keep exactly one row per key (the smallest `order`), dropping
    * exact duplicates. Deterministic — unlike `dropDuplicates`, whose
    * survivor is arbitrary — so results are oracle-comparable and
    * stable under re-partitioning.
    */
  def exactDedup(df: DataFrame, key: Column, order: Column): DataFrame =
    df.withColumn("_rn",
        row_number().over(Window.partitionBy(key).orderBy(order)))
      .filter(col("_rn") === 1)
      .drop("_rn")

  /** Distinct word n-gram shingles of `text` (empty array below n
    * tokens).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, "\\s+")
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(0), size(toks) - n), i =>
          concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** k-minhash signature of a shingle array: for seed j,
    * min over shingles of xxhash64(j, shingle). Fixed seeds ⇒
    * deterministic across runs and partitionings.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map(j =>
      array_min(transform(shingleCol, s => xxhash64(lit(j), s)))): _*)

  /** LSH band keys: b bands of r contiguous signature rows, each
    * hashed to one long. k must equal b*r.
    */
  def bandKeys(sigCol: Column, b: Int, r: Int): Column =
    array((0 until b).map(j =>
      xxhash64((lit(j) +: (0 until r).map(i =>
        element_at(sigCol, j * r + i + 1))): _*)): _*)

  /** Near-duplicate pairs with exact Jaccard >= `threshold`.
    *
    * @param df   input with an id column and a text column
    * @param id   unique row id (pairs are emitted with id_a < id_b)
    * @param text document text
    * @return (doc_a, doc_b, jaccard), candidates found via banded LSH
    *         and verified with exact shingle Jaccard
    */
  def nearDupPairs(df: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val withSh = df.select(id.as("_id"), shingles(text, shingleN).as("_sh"))
    val withBands = withSh
      .withColumn("_bands", bandKeys(minhashSignature(col("_sh"), k), bands, r))
      .select(col("_id"), col("_sh"),
        posexplode(col("_bands")).as(Seq("_band", "_bh")))

    // candidates: same band index + band hash; dedup before the
    // (relatively expensive) exact verification
    val left = withBands.select(col("_band"), col("_bh"),
      col("_id").as("_ida"), col("_sh").as("_sha"))
    val right = withBands.select(col("_band"), col("_bh"),
      col("_id").as("_idb"), col("_sh").as("_shb"))
    val candidates = left.join(right, Seq("_band", "_bh"))
      .filter(col("_ida") < col("_idb"))
      .select(col("_ida"), col("_idb"), col("_sha"), col("_shb"))
      .dropDuplicates("_ida", "_idb")

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("_sha"), col("_shb"))).cast("double") /
          size(array_union(col("_sha"), col("_shb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("_ida").as("doc_a"), col("_idb").as("doc_b"),
        col("jaccard"))
  }

  /** Greedy near-dedup: drop every document that appears as the larger
    * id of a near-duplicate pair; keep the rest.
    */
  def nearDedup(df: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    val losers = nearDupPairs(df, id, text, shingleN, k, bands, threshold)
      .select(col("doc_b").as("_loser")).distinct()
    df.join(losers, id === col("_loser"), "left_anti")
  }
}
