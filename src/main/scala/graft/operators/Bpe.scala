package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Byte-pair-encoding tokenizer TRAINING (Sennrich, Haddow & Birch,
  * ACL 2016) as a distributed relational computation: the iterative
  * "count adjacent symbol pairs → merge the most frequent pair
  * everywhere" loop that produces a subword vocabulary — run over
  * the whole corpus with exact integer counts, a pinned
  * deterministic tie-break, and a DuckDB oracle that replays every
  * round CTE for CTE.
  *
  * The subtle part is applying a merge EXACTLY as the sequential
  * greedy left-to-right scan would. A pair occurrence chain
  * (positions i and i+1 both matching) is only possible when
  * left == right (t[i], t[i+1], t[i+2] = x, x, x), and greedy takes
  * every SECOND occurrence of a chain — so the closed relational
  * form is: within each maximal run of consecutive match positions,
  * merge the EVEN offsets. That rule reproduces greedy bit-for-bit
  * for both the x≠y case (all runs have length 1) and the x==x
  * run-parity case ("aaaa" → "(aa)(aa)", "aaa" → "(aa)a"), and both
  * engines compute it with the same three window functions.
  *
  * Scale shape (round-17): training runs over the DISTINCT-WORD
  * frequency relation — one corpus aggregation up front, then every
  * round is a pair-count aggregate + a greedy merge kernel over
  * |vocabulary| rows (see [[trainLoop]]); encoding applies the whole
  * trained merge list as one codegen'd kernel per word — zero
  * exchanges ([[encode]]). The per-character relational formulation
  * ([[charSymbols]] + [[applyMerge]] window passes) is kept as the
  * spec-pinned executable reference for the run-parity rule. The
  * merge TABLE (the trained vocabulary) is O(rounds) driver metadata,
  * exactly what a BPE trainer emits; the word relation is persisted
  * per round and unpersisted after the next round materializes.
  * Word-internal merging only (the standard BPE word boundary):
  * pairs never cross whitespace.
  */
object Bpe {

  /** The per-(doc, word) character-symbol relation BPE starts from:
    * (doc_id, widx, pos, tok) — lowercased, whitespace-split
    * ([[TextStats.WsRegex]]), empty words dropped.
    */
  def charSymbols(df: DataFrame, id: Column, text: Column): DataFrame = {
    val words = df.select(id.as("doc_id"),
        posexplode(filter(split(lower(text), TextStats.WsRegex),
          w => length(w) > 0)))
      .withColumnRenamed("pos", "widx")
      .withColumnRenamed("col", "w")
    words.select(col("doc_id"), col("widx"),
        posexplode(codePoints(col("w"))))
      .withColumnRenamed("col", "tok")
  }

  /** [[graft.functions.CodePoints]] as a Column — the codegen'd
    * replacement for the interpreted per-char HOF split (round-17).
    */
  private def codePoints(w: Column): Column =
    Bridge.column(graft.functions.CodePoints(Bridge.expression(w)))

  /** The greedy run-parity merge decision, computed entirely inside
    * ONE window ordering (round-17, guide §2.4 "remove shuffles/sorts
    * outright"): the previous formulation derived the run-relative
    * offset with a second window PARTITIONED on (doc, word, run, m) —
    * a different partition key, so every merge application paid an
    * extra full sort of the symbol relation (and the trailing
    * `_consumed` lag a third, to restore pos order). All three facts
    * are expressible over the SAME (doc, word) × pos ordering:
    *
    *   _m      = tok == l && next == r              (match position)
    *   _mi     = running count of matches           (frame sum)
    *   _rsmi   = _mi at the current run's start     (last non-null of
    *             `_mi where _m && !lag(_m)` — a run is CONSECUTIVE
    *             match rows, so the most recent run-start at or before
    *             a match row is its own run's first row)
    *   _merge  = _m && (_mi − _rsmi) even           (greedy = every
    *             second occurrence along the chain, from the start)
    *
    * which Catalyst stacks as window nodes over one sort. Equivalence
    * to the two-window form: for a match row, min(_mi) over its
    * (doc, word, run, m) group IS the run-start's _mi — BpeSpec pins
    * the window form against the sequential scan either way.
    * Appends `_merge` (this row absorbs its right neighbor) and
    * `_consumed` (this row was absorbed) to `marked`'s columns.
    */
  private def withMergeFlags(marked: DataFrame,
      wOrd: org.apache.spark.sql.expressions.WindowSpec): DataFrame = {
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    marked
      .withColumn("_pm",
        coalesce(lag(col("_m"), 1).over(wOrd), lit(false)))
      .withColumn("_mi", sum(when(col("_m"), 1L).otherwise(0L))
        .over(wCum))
      .withColumn("_rsmi",
        last(when(col("_m") && !col("_pm"), col("_mi")),
          ignoreNulls = true).over(wCum))
      .withColumn("_merge", col("_m") &&
        pmod(col("_mi") - col("_rsmi"), lit(2L)) === 0L)
      .withColumn("_consumed",
        coalesce(lag(col("_merge"), 1).over(wOrd), lit(false)))
  }

  /** One greedy merge of (l, r) → l+r applied everywhere, via the
    * run-parity rule. `syms` must have (doc_id, widx, pos, tok);
    * output has the same shape (pos values stay sparse — only their
    * ORDER matters, which every consumer respects). Single-sort: see
    * [[withMergeFlags]].
    */
  private[graft] def applyMerge(syms: DataFrame, l: String,
      r: String): DataFrame = {
    val wOrd = Window.partitionBy("doc_id", "widx").orderBy("pos")
    val marked = syms
      .withColumn("_nx", lead(col("tok"), 1).over(wOrd))
      .withColumn("_m", col("tok") === lit(l) && col("_nx") === lit(r))
    withMergeFlags(marked, wOrd).filter(!col("_consumed"))
      .select(col("doc_id"), col("widx"), col("pos"),
        when(col("_merge"), concat(col("tok"), col("_nx")))
          .otherwise(col("tok")).as("tok"))
  }


  /** ENCODE a corpus with a trained merge list: apply each (left,
    * right) merge in rank order — the production contract of a
    * tokenizer (train once, apply to every new batch). Returns the
    * final (doc_id, widx, pos, tok) symbol relation; `pos` is dense
    * per word (order-only — every consumer respects order, not
    * values).
    *
    * Round-17 shape (guide §1.2 step 2): applying a KNOWN merge list
    * is purely word-local, so the whole chain runs as ONE codegen'd
    * kernel per word ([[graft.functions.EncodeBpeWord]] — code-point
    * split + R greedy passes inside the task) — ZERO exchanges, zero
    * sorts, no per-character relation at all, at any scale. The
    * previous window formulation ([[encodeWindowed]], kept as the
    * spec-pinned relational reference) paid one exchange + R stacked
    * window passes over a relation ~5× the corpus row count.
    * BpeSpec pins kernel == windowed == packed == sequential,
    * including the l == r chain-parity cases.
    */
  def encode(df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val ws = filter(split(lower(text), TextStats.WsRegex),
      w => length(w) > 0)
    df.select(id.as("doc_id"), posexplode(ws))
      .withColumnRenamed("pos", "widx")
      .select(col("doc_id"), col("widx"),
        posexplode(Bridge.column(graft.functions.EncodeBpeWord(
          Bridge.expression(col("col")), merges))))
      .withColumnRenamed("col", "tok")
  }

  /** The relational window-form encoder — [[applyMerge]] folded over
    * the per-character symbol relation. Superseded by the kernel
    * [[encode]] for the declared queries (round-17) but kept as the
    * executable reference for the run-parity rule: BpeSpec pins
    * kernel == windowed == sequential. `pos` stays sparse here.
    */
  private[graft] def encodeWindowed(df: DataFrame, id: Column,
      text: Column, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(charSymbols(df, id, text)) {
      case (s, (l, r)) => applyMerge(s, l, r)
    }

  /** One greedy merge applied INSIDE a token array — the packed form
    * of [[applyMerge]]: a left fold that joins the current token to
    * the accumulator's last element when they match (l, r). Greedy
    * equivalence: a merged token l+r can never re-match as l (strictly
    * longer), so the fold cannot cascade within one merge, and for
    * l == r chains the fold takes every second occurrence — exactly
    * the run-parity rule (BpeSpec pins packed == window form ==
    * sequential).
    */
  private def mergeInArray(arr: Column, l: String, r: String): Column =
    aggregate(arr, array().cast("array<string>"),
      (acc, t) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && t === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(t))))

  /** [[encode]] without the per-character relation: each word's whole
    * merge chain runs as one nested array fold per row, so the corpus
    * is never exploded to symbols — ZERO exchanges and no window sort
    * before whatever the caller aggregates, versus [[encode]]'s one
    * exchange + sort of a per-character relation ~5× the corpus row
    * count.
    *
    * Measured trade (sf0.1, local[32]): packed 5.5 s vs window 4.8 s —
    * the fold's per-element array copies (higher-order functions
    * rebuild the accumulator each step and sit outside whole-stage
    * codegen) cost MORE CPU locally than the Tungsten sort+window they
    * replace. q_bpe_encode therefore keeps the window form; this form
    * is the right choice when the shuffle is the bottleneck (network-
    * bound clusters, corpora whose symbol relation would spill) — the
    * classic CPU-vs-shuffle trade, recorded here with numbers instead
    * of assumed. Same output contract as [[encode]]:
    * (doc_id, widx, pos, tok), pos order-only (dense here, sparse
    * there); BpeSpec pins packed == window == sequential.
    */
  def encodePacked(df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val ws = filter(split(lower(text), TextStats.WsRegex),
      w => length(w) > 0)
    def chars(w: Column): Column = codePoints(w)
    def encodeWord(w: Column): Column =
      merges.foldLeft(chars(w)) { case (a, (l, r)) =>
        mergeInArray(a, l, r) }
    df.select(id.as("doc_id"),
        posexplode(transform(ws, w => encodeWord(w))))
      .withColumnRenamed("pos", "widx")
      .select(col("doc_id"), col("widx"), posexplode(col("col")))
      .withColumnRenamed("col", "tok")
  }

  /** Train `rounds` BPE merges over `text`: one row per learned
    * merge, (round 1.., left, right, merged, freq) with freq the
    * exact corpus-wide adjacent-pair count at the moment the merge
    * was chosen (overlapping occurrences counted, the standard BPE
    * convention) and ties broken (freq DESC, left ASC, right ASC).
    * Stops early if no pair occurs twice (the vocabulary is done).
    */
  def train(df: DataFrame, id: Column, text: Column,
      rounds: Int): DataFrame = {
    val spark = df.sparkSession
    val out = trainLoop(df, id, text, rounds)
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.map {
        case (n, l, r, m, f) => Row(n, l, r, m, f)
      }, 1),
      StructType(Seq(StructField("round", LongType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))
  }

  /** Train and PERSIST the tokenizer as a saved table — the artifact
    * a production tokenizer ships (round-15 verdict Next #2,
    * mirroring the ANN persisted-index pattern: tokenizers are
    * trained once per corpus era and applied to every batch forever;
    * a pipeline that re-pays the iterative train per query re-scans
    * the corpus R times for nothing). The table is the full [[train]]
    * output (round, left, right, merged, freq), so the artifact
    * doubles as the oracle-checkable merge relation and survives
    * sessions through the catalog exactly like the ANN index tables —
    * and like them it is EXTERNAL (explicit `path`): a fresh catalog
    * re-creating the table over a leftover data dir overwrites it,
    * where a managed CTAS would refuse with LOCATION_ALREADY_EXISTS.
    */
  def buildArtifact(df: DataFrame, id: Column, text: Column,
      rounds: Int, table: String, path: String): Unit =
    train(df, id, text, rounds).write.mode("overwrite")
      .option("path", path).saveAsTable(table)

  /** A saved artifact's merge list in rank order — O(rounds) driver
    * metadata, the form [[encode]] consumes. Zero corpus scans and
    * zero training jobs: the one collect reads the rounds-row
    * artifact table (the same driver-metadata contract as the inline
    * trainer's own per-round top-1 collect).
    */
  def artifactMerges(spark: SparkSession,
      table: String): Seq[(String, String)] =
    spark.table(table).orderBy("round")
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** [[encode]] against a saved artifact — the steady-state
    * production shape: the returned plan is the merge-chain window
    * passes alone (ONE exchange on (doc_id, widx), per [[encode]]),
    * with no iterative training anywhere in its lineage. BpeSpec pins
    * artifact-encode ≡ inline-train encode row for row.
    */
  def encodeFromArtifact(spark: SparkSession, table: String,
      df: DataFrame, id: Column, text: Column): DataFrame =
    encode(df, id, text, artifactMerges(spark, table))

  /** The trained merge list as driver metadata — the form [[encode]]
    * consumes (rank order preserved).
    */
  def trainedMerges(df: DataFrame, id: Column, text: Column,
      rounds: Int): Seq[(String, String)] =
    trainLoop(df, id, text, rounds).map(t => (t._2, t._3))

  private def trainLoop(df: DataFrame, id: Column, text: Column,
      rounds: Int): Seq[(Long, String, String, String, Long)] = {
    require(rounds >= 1, "rounds must be >= 1")
    // Round-17 (guide §1.2 step 1 — fix the distributed algorithm):
    // train over the DISTINCT-WORD FREQUENCY relation, the classic
    // Sennrich trainer shape. A pair's corpus-wide count is
    // Σ_w cnt(w) · occurrences_in(w), so ONE corpus aggregation to
    // (word, cnt) up front replaces the per-character corpus relation
    // entirely: every round then counts pairs and applies the merge
    // over |distinct words| rows instead of |corpus characters| —
    // at 100 TB that is the difference between O(vocabulary) and
    // O(corpus) PER ROUND, and it is why production BPE trainers all
    // work on the word-frequency table. Pair extraction reuses the
    // Shingles kernel (n = 2, positional): tokens never contain
    // WsRegex characters, so the "l r" pair string splits back
    // unambiguously on the single space. The merge application is the
    // sequential greedy kernel ([[graft.functions.BpeMergeWord]]).
    // freq numbers, tie-breaks, and early-stop are IDENTICAL to the
    // per-character formulation (BpeSpec pins train == sequential
    // reference, including chain-parity counting).
    def pairsOf(toks: Column): Column =
      Bridge.column(graft.functions.Shingles(
        Bridge.expression(toks), 2, hashed = false, distinct = false))
    var syms = Bridge.persistRows(
      df.select(explode(filter(split(lower(text), TextStats.WsRegex),
          w => length(w) > 0)).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(col("cnt"), codePoints(col("w")).as("toks")))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var round = 1
    var done = false
    // the previous round's persisted relation: freed only AFTER the
    // current round's top-1 job has materialized `syms` (persistRows
    // is lazy — freeing `prev` before that job would force the new
    // round to recompute the whole merge chain from the source)
    var prev: DataFrame = null
    while (round <= rounds && !done) {
      val top = syms
        .select(col("cnt"), explode(pairsOf(col("toks"))).as("pair"))
        .groupBy("pair").agg(sum(col("cnt")).as("freq"))
        .select(split_part(col("pair"), lit(" "), lit(1)).as("l"),
          split_part(col("pair"), lit(" "), lit(2)).as("r"), col("freq"))
        .orderBy(col("freq").desc, col("l"), col("r")).limit(1)
        .collect()
      if (prev != null) { Bridge.unpersistRows(prev); prev = null }
      if (top.isEmpty || top.head.getAs[Long]("freq") < 2L) done = true
      else {
        val (l, r, f) = (top.head.getString(0), top.head.getString(1),
          top.head.getAs[Long]("freq"))
        out += ((round.toLong, l, r, l + r, f))
        // RDD-chain truncation at a fixed cadence: production BPE
        // runs THOUSANDS of merge rounds, and each round's relation
        // references the previous one — without severing, the chain
        // depth equals the merge count (Bridge.checkpointRows doc;
        // round-12 verdict #3). The next round's top-1 job
        // materializes the relation, which is when the checkpoint
        // cuts; unpersistRows skips checkpointed prevs by design.
        val merged = syms.select(col("cnt"),
          Bridge.column(graft.functions.BpeMergeWord(
            Bridge.expression(col("toks")), l, r)).as("toks"))
        val next = if (round % 6 == 0) Bridge.checkpointRows(merged)
          else Bridge.persistRows(merged)
        prev = syms
        syms = next
        round += 1
      }
    }
    // normal completion (round > rounds) leaves BOTH the last round's
    // relation (syms) and the second-to-last (prev — its in-loop free
    // only runs when ANOTHER round executes) cached; free both
    if (prev != null) Bridge.unpersistRows(prev)
    Bridge.unpersistRows(syms)
    out.toSeq
  }
}
