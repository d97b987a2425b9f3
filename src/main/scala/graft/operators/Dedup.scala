package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

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

  /** Distinct word n-gram shingles of a token array — single-pass
    * custom expression ([[graft.functions.Shingles]]).
    *
    * PERF HISTORY (why not built-ins): `transform(sequence(...), i =>
    * element_at(toks, i+j))` re-evaluates expressions referenced inside
    * the lambda PER ELEMENT (no CSE), and `CollapseProject` inlines an
    * upstream `split` into the lambda — observed as O(tokens²)
    * re-splitting that pinned one core for minutes at sf0.1. The
    * zip_with-over-shifted-slices form fixed the asymptotics but still
    * paid interpreted per-element lambda evaluation; the custom node
    * is one JVM pass per row.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    Bridge.column(graft.functions.Shingles(Bridge.expression(toks), n))

  /** Shingles directly from text (tokenized on whitespace). */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(split(text, TextStats.WsRegex), n)

  /** 64-bit-hashed shingles (same single pass, xxhash64 per gram):
    * the set-similarity fast path — long join keys and sorted-long
    * merge-scan verification. See [[graft.functions.Shingles]] for the
    * collision argument.
    */
  def hashedShingles(text: Column, n: Int): Column =
    hashedShinglesFromTokens(split(text, TextStats.WsRegex), n)

  /** Hashed shingles from a pre-tokenized array. */
  def hashedShinglesFromTokens(toks: Column, n: Int): Column =
    Bridge.column(graft.functions.Shingles(
      Bridge.expression(toks), n, hashed = true))

  /** k-minhash signature of a shingle array — single-pass custom
    * expression, see [[graft.functions.MinHashSignature]]. Fixed
    * constants ⇒ deterministic across runs and partitionings.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    Bridge.column(
      graft.functions.MinHashSignature(Bridge.expression(shingleCol), k))

  /** b LSH band keys over the k-minhash signature — computed inside the
    * same single pass ([[graft.functions.MinHashBands]]).
    */
  def minhashBands(shingleCol: Column, k: Int, b: Int): Column =
    Bridge.column(
      graft.functions.MinHashBands(Bridge.expression(shingleCol), k, b))

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
      threshold: Double = 0.8, bucketCap: Int = 1000): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    // shingles are 64-bit-hashed in the shingle kernel's own pass and
    // sorted once per row: the `_sh` payload replicated through the
    // BucketPairs salting shuffle moves 8-byte longs instead of gram
    // strings, and verification is the zero-allocation merge-scan
    // kernel instead of per-pair array_intersect + array_union hash
    // sets. MinHash signatures are bit-identical to the string path
    // (the kernel pre-computes exactly the per-element hash MinHashBase
    // uses, and the min-fold is order-independent), so the candidate
    // set is unchanged; jaccard over hashes equals jaccard over grams
    // up to 64-bit collisions (see graft.functions.Shingles).
    // persisted (RDD layer) BEFORE the band explode: BucketPairs
    // consumes its input three times (size lookup + both join sides),
    // and each evaluation would otherwise re-shingle and re-minhash the
    // corpus; the pre-explode relation is one row per doc (sorted gram
    // hashes + b band keys), so the per-consumer explode is arithmetic
    // over cached blocks.
    val withSh = Bridge.persistRows(df
      .select(id.as("_id"), split(text, TextStats.WsRegex).as("_toks"))
      .select(col("_id"),
        sort_array(hashedShinglesFromTokens(col("_toks"), shingleN)).as("_sh"))
      .withColumn("_bands", minhashBands(col("_sh"), k, bands)))
    val withBands = withSh
      .select(col("_id"), col("_sh"),
        posexplode(col("_bands")).as(Seq("_band", "_bh")))

    // candidates: same band index + band hash, generated with bounded
    // per-task input (degenerate bands — N identical docs — split into
    // sub-buckets, see BucketPairs); dedup before the (relatively
    // expensive) exact verification
    val candidates = BucketPairs
      .boundedPairs(withBands, Seq("_band", "_bh"), "_id", Seq("_sh"),
        bucketCap)
      .dropDuplicates("_id_a", "_id_b")

    val overlap = Bridge.column(graft.functions.SortedOverlapCount(
      Bridge.expression(col("_sh_a")), Bridge.expression(col("_sh_b"))))
    candidates
      .withColumn("_ovl", overlap)
      .withColumn("jaccard", col("_ovl").cast("double") /
        (size(col("_sh_a")) + size(col("_sh_b")) - col("_ovl")))
      .filter(col("jaccard") >= threshold)
      .select(col("_id_a").as("doc_a"), col("_id_b").as("doc_b"),
        col("jaccard"))
  }

  /** SQL-parity MinHash-LSH with per-pair audit columns — the ENTIRE
    * LSH pipeline under the oracle hash gate, which the production
    * xxh64 path ([[nearDupPairs]]) structurally cannot be (wrapping
    * 64-bit rehash; DuckDB BIGINT errors on overflow, so its oracle
    * brute-forces only the final pair set). Here grams are md5-parity
    * hashes and signatures come from the mod-p affine family
    * ([[graft.functions.MinHashSignatureMod]]) that DuckDB replays
    * exactly with HUGEINT intermediates — so the oracle checks the
    * signatures, the band keys, the candidate set, AND the
    * matching-component estimate, not just the verified pairs.
    *
    * Emits one row per CANDIDATE pair (≥1 shared band), with the
    * audit columns a dedup operator's quality review needs:
    * shared-band count, matching signature components, the estimated
    * Jaccard (components/k) and the exact Jaccard — i.e. the
    * candidate-precision / estimation-error evidence, per pair.
    *
    * Scale shape: identical to [[nearDupPairs]] — one persisted
    * narrow relation per doc (sorted gram hashes + signature), band
    * explode, [[BucketPairs.boundedPairs]] salted candidates (never
    * all-pairs), merge-scan exact verification. The mod-p rehash is
    * ~2× the wrapping rehash per gram (multiplyHigh + folds) — the
    * parity tax; production dedup keeps the xxh64 path.
    */
  def lshParityAudit(df: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      bucketCap: Int = 1000): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val withSig = Bridge.persistRows(df
      .select(id.as("_id"), split(text, TextStats.WsRegex).as("_toks"))
      .select(col("_id"),
        sort_array(md5GramHashes(col("_toks"), shingleN)).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .withColumn("_sig", Bridge.column(graft.functions.MinHashSignatureMod(
        Bridge.expression(col("_sh")), k))))
    // band key = the r components joined as text — the one encoding
    // both engines produce byte-identically (Long.toString ==
    // BIGINT::VARCHAR); r is tiny so the per-row lambda cost is noise
    val banded = withSig.select(col("_id"), col("_sh"), col("_sig"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
        s"array_join(transform(slice(_sig, b*$r+1, $r), " +
        "v -> cast(v as string)), ','))")).as(Seq("_band", "_bk")))
    val perPair = BucketPairs
      .boundedPairs(banded, Seq("_band", "_bk"), "_id", Seq("_sh", "_sig"),
        bucketCap)
      // one row per (pair, shared band) — the count IS the band tally
      .groupBy(col("_id_a"), col("_id_b"))
      .agg(count(lit(1)).as("n_shared_bands"),
        first(col("_sh_a")).as("_sh_a"), first(col("_sh_b")).as("_sh_b"),
        first(col("_sig_a")).as("_sig_a"), first(col("_sig_b")).as("_sig_b"))
    val overlap = Bridge.column(graft.functions.SortedOverlapCount(
      Bridge.expression(col("_sh_a")), Bridge.expression(col("_sh_b"))))
    perPair
      .withColumn("n_match_sig",
        size(filter(zip_with(col("_sig_a"), col("_sig_b"), (x, y) => x === y),
          b => b)).cast("long"))
      .withColumn("_ovl", overlap)
      .select(col("_id_a").as("doc_a"), col("_id_b").as("doc_b"),
        col("n_shared_bands"), col("n_match_sig"),
        (col("n_match_sig").cast("double") / lit(k.toDouble))
          .as("est_jaccard"),
        (col("_ovl").cast("double") /
          (size(col("_sh_a")) + size(col("_sh_b")) - col("_ovl")))
          .as("exact_jaccard"))
  }

  /** 64-bit SimHash of a shingle array (single-pass custom expression,
    * [[graft.functions.SimHash]]).
    */
  def simhash(shingleCol: Column): Column =
    Bridge.column(graft.functions.SimHash(Bridge.expression(shingleCol)))

  /** SQL-parity 60-bit gram hash: the integer value of the first 15
    * hex chars of md5(gram), computed inside the shingle kernel's
    * single pass directly from digest bytes (no hex string, no conv
    * parse — see [[graft.functions.Shingles.md5Prefix60]]). Slower
    * than xxh64 (md5 is a cryptographic digest) but EXACTLY
    * reproducible in the DuckDB oracle
    * (`('0x' || substr(md5(g), 1, 15))::BIGINT`), which puts the
    * entire SimHash pipeline under the hash gate instead of a
    * rows-only check. 60 bits keeps the value positive in both
    * engines' signed BIGINT. The earlier `transform(..., g =>
    * conv(substring(md5(g),1,15),16,10))` form paid interpreted
    * per-element lambda evaluation plus two string round-trips per
    * gram — measured as ~4 s of q_simhash_pairs' 5.2 s at sf0.1.
    */
  def md5GramHashes(toks: Column, n: Int): Column =
    Bridge.column(graft.functions.Shingles(
      Bridge.expression(toks), n, md5Parity = true))

  /** Near-duplicate pairs by SimHash Hamming distance <= `maxHamming`.
    *
    * Candidates come from banding the 64-bit hash into `bands` chunks
    * and equi-joining on (band, chunk): by pigeonhole, any pair within
    * Hamming distance < bands shares at least one exact chunk, so with
    * the default 4 bands recall is COMPLETE for maxHamming <= 3 (and
    * probabilistic above). Verification is an exact bit_count(xor).
    * Same no-all-pairs shape as the MinHash path: the only join key is
    * the 16-bit chunk.
    *
    * `sqlParityHash = true` swaps the per-gram xxh64 for
    * [[md5GramHashes]] — same voting kernel, same banding, same
    * verification, but every value is oracle-recomputable.
    */
  def simhashNearDupPairs(df: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, maxHamming: Int = 3, bands: Int = 4,
      bucketCap: Int = 1000, sqlParityHash: Boolean = false): DataFrame = {
    val width = 64 / bands
    val mask = (1L << width) - 1L
    // grams are hashed inside the shingle kernel's single pass (the
    // SimHash kernel votes on pre-hashed longs bit-identically to the
    // string path), and the (id, sim) relation — 16 bytes/doc — is
    // persisted at the RDD layer: BucketPairs consumes its input three
    // times (size lookup + both join sides), and without the persist
    // each evaluation re-shingled and re-hashed the whole corpus
    // (measured 3x the query's entire remaining cost at sf0.1).
    def gramHashes(toks: Column): Column =
      if (sqlParityHash) md5GramHashes(toks, shingleN)
      else hashedShinglesFromTokens(toks, shingleN)
    val withSim = Bridge.persistRows(df
      .select(id.as("_id"), split(text, TextStats.WsRegex).as("_toks"))
      .select(col("_id"),
        simhash(gramHashes(col("_toks"))).as("_sim")))
    val chunks = withSim.select(col("_id"), col("_sim"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("_sim"), b * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("_band", "_chunk")))
    BucketPairs
      .boundedPairs(chunks, Seq("_band", "_chunk"), "_id", Seq("_sim"),
        bucketCap)
      .dropDuplicates("_id_a", "_id_b")
      .withColumn("hamming",
        bit_count(col("_sim_a").bitwiseXOR(col("_sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("_id_a").as("doc_a"), col("_id_b").as("doc_b"),
        col("hamming"))
  }

  /** Winnowing fingerprint near-dup pairs (Schleimer, Wilkerson &
    * Aiken, SIGMOD 2003 — the MOSS algorithm): the third dedup family
    * next to MinHash (set resemblance) and SimHash (vector cosine),
    * and the standard one for LOCAL overlap — shared contiguous spans
    * — because its guarantee is positional: every shared run of at
    * least `window + shingleN - 1` tokens yields at least one shared
    * fingerprint, with index density 2/(window+1) of the gram count.
    *
    * Stages: the per-document DISTINCT sliding-min fingerprints come
    * out of ONE codegen'd kernel pass
    * ([[graft.functions.WinnowFps]]: positional gram md5 hashes,
    * window minima, per-doc dedup — the gram sequence and its window
    * minima are row-local, so the round-16 keyed-window form paid an
    * exchange + sort + global distinct for nothing; round-17, guide
    * §2.4) → fingerprint-keyed [[BucketPairs.boundedPairs]] candidates
    * (never all-pairs; a boilerplate fingerprint shared by N docs is
    * salted, not funneled to one task) → per-pair shared-fingerprint
    * count with the fingerprint-set Jaccard. Every value is
    * oracle-recomputable: the hash is SQL md5, the min/count are
    * exact, the one double is a single division of exact integers.
    *
    * Emits (doc_a, doc_b, n_shared, n_fp_a, n_fp_b, jaccard_fp) for
    * pairs sharing >= `minShared` fingerprints.
    */
  /** The distinct (_id, _fp) winnowing fingerprint relation —
    * [[winnowPairs]]' first stage, exposed separately so the plan
    * audit can pin its shape (inside winnowPairs it sits behind a
    * persistRows boundary, which the executed plan renders as an
    * opaque `Scan ExistingRDD`). One narrow kernel explode — no
    * exchange anywhere ([[graft.functions.WinnowFps]] computes the
    * positional gram hashes, sliding minima, and per-doc dedup in the
    * scan task). `id` must be unique: per-doc dedup equals the old
    * global distinct exactly when it is (the contract winnowPairs and
    * every other pair operator here already state).
    */
  def winnowFingerprints(df: DataFrame, id: Column, text: Column,
      shingleN: Int, window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    df.select(id.as("_id"), split(text, TextStats.WsRegex).as("_toks"))
      .select(col("_id"),
        explode(Bridge.column(graft.functions.WinnowFps(
          Bridge.expression(col("_toks")), shingleN, window))).as("_fp"))
  }

  def winnowPairs(df: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, window: Int = 4, minShared: Int = 8,
      bucketCap: Int = 1000): DataFrame = {
    val fps = Bridge.persistRows(
      winnowFingerprints(df, id, text, shingleN, window))
    val withN = fps.join(
      fps.groupBy("_id").agg(count(lit(1)).as("_nfp")), Seq("_id"))
    val pairs = BucketPairs
      .boundedPairs(withN, Seq("_fp"), "_id", Seq("_nfp"), bucketCap,
        spreadInput = true) // payload = one long; enumeration-bound
      .groupBy(col("_id_a"), col("_id_b"))
      .agg(count(lit(1)).as("n_shared"),
        first(col("_nfp_a")).as("n_fp_a"), first(col("_nfp_b")).as("n_fp_b"))
    pairs.filter(col("n_shared") >= minShared.toLong)
      .select(col("_id_a").as("doc_a"), col("_id_b").as("doc_b"),
        col("n_shared"), col("n_fp_a"), col("n_fp_b"),
        (col("n_shared").cast("double") /
          (col("n_fp_a") + col("n_fp_b") - col("n_shared")))
          .as("jaccard_fp"))
  }

  /** Benchmark decontamination: corpus documents sharing at least
    * `minShared` distinct word n-grams with the benchmark set (eval
    * suites leak into training corpora; n-gram overlap against the
    * benchmark is the standard detector).
    *
    * Shape: grams are 64-bit-hashed in the shingle kernel's single
    * pass (distinct within a document by construction), the benchmark
    * side is reduced to its DISTINCT gram set, and the match is a
    * plain gram equi-join + per-document count. Benchmark sets are
    * small relative to a training corpus, so AQE broadcasts the gram
    * relation at runtime when it fits; the fallback is a shuffle
    * equi-join on an 8-byte key — no all-pairs stage anywhere.
    */
  def contaminated(corpus: DataFrame, bench: DataFrame, id: Column,
      text: Column, n: Int = 3, minShared: Int = 5): DataFrame = {
    val corpusGrams = corpus.select(id.as("_id"),
      explode(hashedShingles(text, n)).as("_g"))
    val benchGrams = bench.select(explode(hashedShingles(text, n)).as("_g"))
      .distinct()
    corpusGrams.join(benchGrams, "_g")
      // grams are distinct per document and distinct on the benchmark
      // side, so the plain count IS the distinct shared-gram count
      .groupBy("_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("_id").as("doc_id"), col("n_shared"))
  }

  /** Incremental (asymmetric) near-dup pairs: NEW batch documents that
    * near-duplicate (exact Jaccard >= `threshold`) ANY document of an
    * EXISTING corpus. This is the production dedup shape at 100 TB —
    * you dedup the daily increment against the accumulated corpus, you
    * never re-run the self-join over the whole history. Emits
    * (doc_new, doc_corpus, jaccard).
    *
    * Shape: both sides banded (in production the corpus side's
    * (band, bh, id, shingles) relation is the precomputed, stored
    * index — here it is derived inline), candidates from the
    * band-key equi-join (never all-pairs; the new side is typically
    * orders of magnitude smaller, so AQE broadcasts it when it fits
    * and splits skewed corpus buckets otherwise), verification by the
    * same sorted-long merge-scan kernel as the self-join path.
    */
  def nearDupPairsAgainst(newDf: DataFrame, corpus: DataFrame,
      id: Column, text: Column, shingleN: Int = 3, k: Int = 32,
      bands: Int = 8, threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    def banded(df: DataFrame, side: String): DataFrame = df
      .select(id.as(s"_id$side"), split(text, TextStats.WsRegex).as("_toks"))
      .select(col(s"_id$side"),
        sort_array(hashedShinglesFromTokens(col("_toks"), shingleN))
          .as(s"_sh$side"))
      .withColumn("_bands", minhashBands(col(s"_sh$side"), k, bands))
      .select(col(s"_id$side"), col(s"_sh$side"),
        posexplode(col("_bands")).as(Seq("_band", "_bh")))
    val candidates = banded(newDf, "_n")
      .join(banded(corpus, "_c"), Seq("_band", "_bh"))
      .dropDuplicates("_id_n", "_id_c")
    val overlap = Bridge.column(graft.functions.SortedOverlapCount(
      Bridge.expression(col("_sh_n")), Bridge.expression(col("_sh_c"))))
    candidates
      .withColumn("_ovl", overlap)
      .withColumn("jaccard", col("_ovl").cast("double") /
        (size(col("_sh_n")) + size(col("_sh_c")) - col("_ovl")))
      .filter(col("jaccard") >= threshold)
      .select(col("_id_n").as("doc_new"), col("_id_c").as("doc_corpus"),
        col("jaccard"))
  }

  /** Incremental near-dedup: the NEW documents that survive
    * [[nearDupPairsAgainst]] — the batch to append to the corpus.
    */
  def nearDedupAgainst(newDf: DataFrame, corpus: DataFrame, id: Column,
      text: Column, shingleN: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    val dups = nearDupPairsAgainst(newDf, corpus, id, text, shingleN, k,
        bands, threshold)
      .select(col("doc_new").as("_dup")).distinct()
    newDf.join(dups, id === col("_dup"), "left_anti")
  }

  /** Greedy near-dedup: drop every document that appears as the larger
    * id of a near-duplicate pair; keep the rest.
    */
  def nearDedup(df: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.8, bucketCap: Int = 1000): DataFrame = {
    val losers = nearDupPairs(df, id, text, shingleN, k, bands, threshold,
        bucketCap)
      .select(col("doc_b").as("_loser")).distinct()
    df.join(losers, id === col("_loser"), "left_anti")
  }
}
