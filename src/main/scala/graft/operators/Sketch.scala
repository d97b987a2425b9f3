package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Deterministic-hash sketch structures. Spark's own sketch surface
  * (approx_count_distinct's HLL, approx_percentile's KLL) is seeded
  * internally and therefore only rows-checkable (q_approx_stats);
  * these variants fix the hash family to the md5-prefix construction
  * shared with [[graft.functions.Shingles]] so every counter — and
  * therefore every estimate — is bit-identical in any engine, giving
  * the sketch family a full value oracle.
  */
object Sketch {

  /** 60-bit md5-prefix hash of a string column — value-identical to
    * DuckDB `('0x' || substr(md5(x), 1, 15))::BIGINT` and to the
    * [[graft.functions.Shingles]] kernel's md5Prefix60 (pinned by
    * ShinglesSpec). Interpreted conv/md5 is fine here: it only ever
    * runs on vocabulary-sized relations, never per corpus row.
    */
  def md5Prefix60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** CMS cell index for term `t` in sketch row `r` — the ONE hash
    * definition shared by the batch sketch below and the streaming
    * counter state ([[graft.streaming.StreamingCms]]), so their
    * counters are comparable cell-for-cell.
    */
  def cmsCell(r: Column, t: Column, w: Int): Column =
    pmod(md5Prefix60(concat(r.cast("string"), lit(":"), t)),
      lit(w.toLong))

  /** Bloom-filter bit relation (Bloom, CACM 1970) for a key set:
    * the distinct bit positions set by `k` md5-prefix hashes per key
    * in an `m`-bit filter. ≤ m rows however large the key set — the
    * build is one map-side-combinable distinct.
    *
    * This is the semi-join-reduction primitive: build the bits over a
    * selective dimension subset, broadcast them, and pre-filter fact
    * rows BEFORE the shuffle join (what Spark's runtime row-group
    * bloom pushdown does natively; the relational form makes the
    * filter auditable and oracle-replayable — every bit is exact
    * integer arithmetic). One-sided error: no false negatives ever;
    * false positives at the classic (1−e^(−kn/m))^k rate.
    */
  def bloomBits(df: DataFrame, key: Column, m: Int, k: Int): DataFrame = {
    require(m >= 2 && k >= 1, "m must be >= 2, k >= 1")
    df.select(key.cast("string").as("_k"),
        explode(sequence(lit(0), lit(k - 1))).as("r"))
      .select(pmod(md5Prefix60(concat(col("r").cast("string"), lit(":"),
        col("_k"))), lit(m.toLong)).as("bit"))
      .distinct()
  }

  /** Probe distinct `key` values of `probe` against a [[bloomBits]]
    * relation: (key, bloom_hit) — hit iff all k probe hashes land on
    * set bits. The bits side is broadcast; the probe side explodes k
    * rows per distinct key, left-joins, and counts matches — the
    * whole probe is one narrow scan + broadcast join, no shuffle of
    * the fact table.
    *
    * Broadcast bound: the bits relation holds SET bits, so its row
    * count is ≤ min(m, n·k) — it scales with the BUILD-side key count
    * n, not with the filter width m (raising m at fixed n only
    * lowers the FP rate; the broadcast stays n·k longs). The
    * semi-join-reduction contract is a SELECTIVE build side (n·k in
    * the millions broadcasts in tens of MB); a build side so large
    * that n·k rows can't broadcast is the signal that bloom
    * pre-filtering is the wrong tool and the plain shuffle semi-join
    * ([[graft.operators.Dedup]] equi-joins) should run instead.
    */
  def bloomProbe(bits: DataFrame, probe: DataFrame, key: Column,
      m: Int, k: Int): DataFrame = {
    require(m >= 2 && k >= 1, "m must be >= 2, k >= 1")
    probe.select(key.as("key")).distinct()
      .select(col("key"), col("key").cast("string").as("_k"),
        explode(sequence(lit(0), lit(k - 1))).as("r"))
      .select(col("key"),
        pmod(md5Prefix60(concat(col("r").cast("string"), lit(":"),
          col("_k"))), lit(m.toLong)).as("bit"))
      .join(broadcast(bits.select(col("bit"), lit(1L).as("_set"))),
        Seq("bit"), "left")
      .groupBy("key")
      .agg((count(col("_set")) === k.toLong).as("bloom_hit"))
  }

  /** Count–min sketch heavy hitters (Cormode & Muthukrishnan '05):
    * top-`k` terms of a document corpus ranked by their CMS count
    * estimate, with the exact count alongside so the one-sided sketch
    * error (est ≥ cnt, overshoot = colliding cells) is auditable per
    * term.
    *
    * The sketch is d rows × w cells of integer counters; term t maps
    * to cell (r, md5₆₀(r ':' t) mod w) in each row and its estimate is
    * the min over the d counters. Counters are sums of exact term
    * counts, so the whole structure is order-free integer arithmetic —
    * the DuckDB oracle rebuilds every counter from scratch and
    * hash-matches the estimates.
    *
    * Scale shape: the corpus-sized work is ONE map-side-combinable
    * (term → count) aggregate; everything after runs on the vocabulary
    * relation (cells is |vocab|·d rows, counters collapse to d·w
    * rows, the estimate join is co-partitioned on (r, cell)). The
    * top-k is the standard rank-window + filter. No collect, no
    * driver-side counter array — at 100 TB the d·w counter relation
    * is what you would broadcast-join against a query term list
    * instead of exact-counting a trillion-term vocabulary twice.
    */
  def cmsHeavyHitters(df: DataFrame, text: Column, d: Int = 3,
      w: Int = 64, k: Int = 20): DataFrame = {
    require(d >= 1 && w >= 1 && k >= 1, "d, w, k must be >= 1")
    val exact = Bridge.persistRows(df
      .filter(text.isNotNull)
      .select(explode(TermStats.cleanWords(text)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt")))
    val cells = exact
      .select(col("term"), col("cnt"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("cell", cmsCell(col("r"), col("term"), w))
    val counters = cells.groupBy("r", "cell")
      .agg(sum(col("cnt")).as("c"))
    val est = cells.join(counters, Seq("r", "cell"))
      .groupBy("term")
      .agg(min(col("c")).as("est"), min(col("cnt")).as("cnt"))
    // TakeOrdered prunes to k rows BEFORE the rank window, so the only
    // single-partition window in the plan runs over k rows, not |vocab|
    val top = est.orderBy(col("est").desc, col("term")).limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("est").desc, col("term"))))
  }
}
