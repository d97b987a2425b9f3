package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard set-similarity self-join with global-frequency
  * prefix filtering (the AllPairs/PPJoin candidate bound, Bayardo et
  * al., WWW'07; Xiao et al., WWW'08).
  *
  * This is the EXACT companion to the approximate near-dup family
  * (MinHash bands in [[Dedup.nearDupPairs]], SimHash chunks, sign-LSH):
  * same no-all-pairs shape — the only wide join key is a single gram —
  * but recall is provably 1.0 at the threshold instead of
  * probabilistic.
  *
  * Prefix-filter guarantee: order every document's distinct grams by
  * ascending global document frequency (ties by the gram itself — any
  * TOTAL order shared by all documents works; rare-first minimizes
  * posting-list sizes). If J(A,B) >= t then |A∩B| >= ceil(t·|A|), so A
  * can exclude at most |A| − ceil(t·|A|) grams of any qualifying
  * partner — meaning every pair with J >= t shares at least one gram
  * inside both prefixes of length |x| − ceil(t·|x|) + 1. Candidates =
  * equi-join on prefix grams; verification = exact intersection on the
  * full gram arrays.
  *
  * GRAM-SPACE CHOICE (measured, sf0.1): prefix filtering is only as
  * selective as the gram space. Character trigrams of natural-language
  * text overlap ~55% between UNRELATED documents (the alphabet is
  * tiny), so at useful thresholds the filter passes nearly all pairs —
  * the operator degenerated to ~all-pairs and 300 s at 5k docs. Word
  * n-grams have near-zero baseline overlap (mean pair Jaccard 0.027 on
  * the documents fixture), so [[wordNgramJaccardPairs]] is the
  * production entry point; [[ngramJaccardPairs]] (char grams) remains
  * for short-string/identifier corpora where characters are the right
  * unit.
  *
  * 100 TB shape: the document-frequency pass is one map-side-combined
  * aggregation on the gram; the prefix join is an equi-join whose
  * per-key fan-out is bounded by rare-gram posting lists and
  * additionally task-bounded through [[BucketPairs]] sub-bucket
  * salting (stop-gram-like heads of the frequency distribution cannot
  * funnel to one reducer); verification joins fetch each candidate's
  * gram array by id — two hash joins linear in the candidate count.
  * Nothing is ever broadcast or collected: the frequency relation
  * flows through the same shuffle as the ranking window.
  */
object SetSimJoin {

  /** Distinct character n-grams of `text` as strings, in input order.
    * Empty array when the text is shorter than n (guards Spark's
    * `sequence(1, k)` which would count DOWN for k < 1).
    */
  def charNgrams(text: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), char_length(text) - (n - 1)),
      i => text.substr(i, lit(n)))
    array_distinct(
      when(char_length(text) >= n, grams)
        .otherwise(array().cast("array<string>")))
  }

  /** All pairs with exact Jaccard >= `threshold` over a precomputed
    * distinct-gram array column (any orderable element type).
    *
    * @param df        input relation
    * @param id        unique row id (pairs are emitted with doc_a < doc_b)
    * @param grams     distinct-gram array for the row
    * @param threshold Jaccard threshold in (0, 1]
    * @param bucketCap max per-task rows for one prefix-gram posting cell
    * @return (doc_a, doc_b, jaccard) — exact, complete at the threshold
    */
  def jaccardPairs(df: DataFrame, id: Column, grams: Column,
      threshold: Double, bucketCap: Int = 1000): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0,1]")
    // toks feeds three consumers (gram explode + both verification
    // sides) and prefix feeds three more (BucketPairs' size lookup and
    // both join roles). Without persistence each consumer re-derives
    // its whole lineage — measured as 14 parquet scans, 6 window
    // sorts, and 9 document-frequency aggregates in one final plan
    // (AQE exchange reuse misses them: the consumers project
    // differently, so the exchanges don't canonicalize equal).
    // Persisting the two shared relations is the 100 TB answer too:
    // the gram relation is O(corpus) on disk, re-shingling the corpus
    // eight times is not. Persistence is RDD-level (Bridge.persistRows)
    // rather than Dataset.persist: blocks are private to this
    // invocation and freed by the ContextCleaner when the returned
    // frame is dropped, instead of accumulating in the CacheManager
    // until an unpersist nobody can sequence around a lazy result.
    import org.apache.spark.sql.graft.Bridge.persistRows
    // sort once per row (amortized over every candidate pair touching
    // the row) so long-gram verification can use the zero-allocation
    // merge-scan kernel instead of a per-pair hash set
    val rawToks = df.select(id.as("_id"), grams.as("_toks"))
    val isLongGrams = rawToks.schema("_toks").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    val toks = persistRows((if (isLongGrams)
        rawToks.withColumn("_toks", sort_array(col("_toks")))
      else rawToks)
      .withColumn("_sz", size(col("_toks"))))

    val gramRows = toks.select(col("_id"), col("_sz"),
      explode(col("_toks")).as("_tok"))
    // global document frequency per gram (map-side combined)
    val freq = gramRows.groupBy("_tok").agg(count(lit(1)).as("_df"))

    // rare-first rank within each document; keep the filter prefix.
    // The 1e-9 nudge keeps ceil(t·|x|) from rounding UP past an exact
    // integer product (0.6·210 = 126 evaluates to 126.00000000000001 in
    // binary FP) — erring toward a LONGER prefix only adds candidates,
    // never loses a qualifying pair.
    val byDoc = Window.partitionBy("_id").orderBy(col("_df"), col("_tok"))
    val prefix = persistRows(gramRows.join(freq, "_tok")
      .withColumn("_rnk", row_number().over(byDoc))
      .filter(col("_rnk") <=
        col("_sz") - ceil(lit(threshold) * col("_sz") - lit(1e-9)) + 1)
      .select("_tok", "_id", "_sz"))

    // candidates: docs sharing a prefix gram (skew-bounded), pruned by
    // the PPJoin length filter — J(A,B) >= t implies t <= |A∩B|/|A∪B|
    // <= min(|A|,|B|)/max(|A|,|B|), so size-mismatched pairs can be
    // dropped BEFORE the dedup shuffle and the verification joins
    // (same conservative epsilon as the prefix bound) — then deduped
    // across covering grams
    val cand = BucketPairs
      .boundedPairs(prefix, Seq("_tok"), "_id", Seq("_sz"), bucketCap)
      .filter(col("_sz_a") >= lit(threshold) * col("_sz_b") - lit(1e-9) &&
        col("_sz_b") >= lit(threshold) * col("_sz_a") - lit(1e-9))
      .select("_id_a", "_id_b")
      .dropDuplicates("_id_a", "_id_b")

    // exact verification on the full gram arrays
    val a = toks.select(col("_id").as("_id_a"), col("_toks").as("_t_a"),
      col("_sz").as("_sz_a"))
    val b = toks.select(col("_id").as("_id_b"), col("_toks").as("_t_b"),
      col("_sz").as("_sz_b"))
    val overlap =
      if (isLongGrams)
        org.apache.spark.sql.graft.Bridge.column(
          graft.functions.SortedOverlapCount(
            org.apache.spark.sql.graft.Bridge.expression(col("_t_a")),
            org.apache.spark.sql.graft.Bridge.expression(col("_t_b"))))
      else size(array_intersect(col("_t_a"), col("_t_b")))
    cand.join(a, "_id_a").join(b, "_id_b")
      .withColumn("_ovl", overlap)
      .withColumn("jaccard", col("_ovl").cast("double") /
        (col("_sz_a") + col("_sz_b") - col("_ovl")))
      .filter(col("jaccard") >= threshold)
      .select(col("_id_a").as("doc_a"), col("_id_b").as("doc_b"),
        col("jaccard"))
  }

  /** Asymmetric containment join — pairs with
    * C(A→B) = |A∩B| / |A| ≥ `threshold`: "A is mostly inside B", the
    * subsumption signal symmetric Jaccard misses (a paragraph quoted
    * verbatim inside a much longer document scores near-zero Jaccard
    * but containment 1.0 — the boilerplate/quotation dedup case).
    *
    * The prefix guarantee is one-sided: C(A→B) ≥ t means A and B
    * share ≥ ⌈t·|A|⌉ grams, while A minus its (|A| − ⌈t·|A|⌉ + 1)-gram
    * rare-first prefix holds only ⌈t·|A|⌉ − 1 grams — so at least one
    * shared gram lies in A's prefix, and the candidate join is
    * A-prefix × the FULL gram relation (B has no size or prefix
    * bound; a container can be arbitrarily large — exactly why the
    * symmetric [[jaccardPairs]] machinery can't express this).
    * Candidate volume is Σ_prefix-gram df — rare-first prefixes keep
    * it near-linear, hot grams land in prefixes only for tiny docs at
    * low thresholds, and the shuffle itself is AQE-skew-split. Exact
    * verification on the full sorted gram arrays, same merge-scan
    * kernel as Jaccard.
    *
    * Output: doc, container, containment — DIRECTIONAL (both
    * directions emitted when mutual). Docs with zero grams never
    * appear on either side (mirrored by the oracle's length guard).
    */
  def containmentPairs(df: DataFrame, id: Column, grams: Column,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0,1]")
    import org.apache.spark.sql.graft.Bridge.persistRows
    val rawToks = df.select(id.as("_id"), grams.as("_toks"))
    val isLongGrams = rawToks.schema("_toks").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    val toks = persistRows((if (isLongGrams)
        rawToks.withColumn("_toks", sort_array(col("_toks")))
      else rawToks)
      .withColumn("_sz", size(col("_toks"))))
    val gramRows = persistRows(toks.select(col("_id"), col("_sz"),
      explode(col("_toks")).as("_tok")))
    val freq = gramRows.groupBy("_tok").agg(count(lit(1)).as("_df"))
    val byDoc = Window.partitionBy("_id").orderBy(col("_df"), col("_tok"))
    val prefix = gramRows.join(freq, "_tok")
      .withColumn("_rnk", row_number().over(byDoc))
      .filter(col("_rnk") <=
        col("_sz") - ceil(lit(threshold) * col("_sz") - lit(1e-9)) + 1)
      .select(col("_tok"), col("_id").as("_id_a"))
    val cand = prefix
      .join(gramRows.select(col("_tok"), col("_id").as("_id_b")), "_tok")
      .filter(col("_id_a") =!= col("_id_b"))
      .select("_id_a", "_id_b")
      .dropDuplicates("_id_a", "_id_b")
    val a = toks.select(col("_id").as("_id_a"), col("_toks").as("_t_a"),
      col("_sz").as("_sz_a"))
    val b = toks.select(col("_id").as("_id_b"), col("_toks").as("_t_b"))
    val overlap =
      if (isLongGrams)
        org.apache.spark.sql.graft.Bridge.column(
          graft.functions.SortedOverlapCount(
            org.apache.spark.sql.graft.Bridge.expression(col("_t_a")),
            org.apache.spark.sql.graft.Bridge.expression(col("_t_b"))))
      else size(array_intersect(col("_t_a"), col("_t_b")))
    cand.join(a, "_id_a").join(b, "_id_b")
      .withColumn("_ovl", overlap)
      .withColumn("containment",
        col("_ovl").cast("double") / col("_sz_a"))
      .filter(col("containment") >= threshold)
      .select(col("_id_a").as("doc"), col("_id_b").as("container"),
        col("containment"))
  }

  /** Word n-gram containment pairs — hashed-shingle production path,
    * same gram equivalence as [[wordNgramJaccardPairs]].
    */
  def wordNgramContainmentPairs(df: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.8): DataFrame =
    containmentPairs(df, id, Dedup.hashedShingles(text, n), threshold)

  /** Word n-gram Jaccard pairs — the production path for natural
    * language (see gram-space note above). Grams are 64-bit hashes from
    * the single-pass [[graft.functions.Shingles]] expression; Jaccard
    * over hashes equals Jaccard over the underlying word n-grams up to
    * 64-bit collisions (the same already-accepted equivalence the
    * MinHash verification path relies on).
    *
    * n sets the selectivity/robustness trade: measured on the sf0.1
    * synthetic fixture (5k docs, ~50-word vocabulary), n=2 yields 931
    * distinct grams → 9.3M prefix candidates, n=3 yields 27k grams →
    * 210k candidates (max posting list 9). Pick n so the gram space is
    * large relative to the corpus; n=3 is the robust default for text.
    */
  def wordNgramJaccardPairs(df: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.7, bucketCap: Int = 1000): DataFrame =
    jaccardPairs(df, id, Dedup.hashedShingles(text, n), threshold, bucketCap)

  /** Character n-gram Jaccard pairs — for short-string / identifier
    * corpora. On natural-language text prefer
    * [[wordNgramJaccardPairs]] (char grams have high baseline overlap
    * and defeat the prefix filter).
    */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.6, bucketCap: Int = 1000): DataFrame =
    jaccardPairs(df, id, charNgrams(text, n), threshold, bucketCap)
}
