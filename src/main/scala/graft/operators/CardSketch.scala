package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality registers in EXACT integer form (Flajolet,
  * Fusy, Gandouet & Meunier, AofA 2007) — the mergeable
  * distinct-count sketch, built so every register (and the harmonic
  * denominator) is replayable bit-for-bit by the SQL oracle.
  *
  * Standard HLL treats the register array as opaque native state; here
  * it is a RELATION: md5-prefix-60 hash → top `mBits` bits pick the
  * bucket, the remaining wBits = 60−mBits bits yield
  * rho = (leading zeros) + 1, and the register is max(rho) per bucket.
  * max over exact integers is order-free and duplicate-absorbing —
  * the defining sketch properties — so ANY partitioning, ANY merge
  * order, and ANY pre-aggregation split produces identical registers,
  * and two corpora's sketches merge by a union + the same max.
  *
  * The estimator's harmonic denominator is ALSO exact:
  * S = Σ_j 2^(wBits+1−M_j) over all m buckets (empty ⇒ M_j = 0) is a
  * BIGINT sum (≤ m·2^(wBits+1) < 2⁶² for mBits ≥ 8's wBits = 52), and
  * the raw estimate α·m²·2^(wBits+1)/S is a fixed-shape double
  * expression over that one exact integer — the chi-square recipe:
  * the double IS gateable because every operand is exact and the
  * expression tree is mirrored verbatim.
  *
  * Scale shape: the corpus-sized work is ONE map-side-combinable
  * groupBy (partial max per bucket in each task — the shuffle carries
  * at most m rows per task, regardless of input size); everything
  * after runs on a ≤ m-row relation. This is the sketch's 100 TB
  * pitch: estimating distinct n-grams in a trillion-gram corpus moves
  * m longs per task where exact counting shuffles the full gram
  * relation. bin(): same no-leading-zeros string contract in Spark
  * and DuckDB (bin(0) = "0"), making bit-length = length(bin(w)).
  */
object CardSketch {

  /** The published HLL bias-correction constant (Flajolet et al. 2007,
    * Fig. 3): the asymptotic 0.7213/(1 + 1.079/m) holds for m ≥ 128;
    * small register counts use the tabulated α₁₆ = 0.673,
    * α₃₂ = 0.697, α₆₄ = 0.709 — the generic formula overestimates by
    * ~0.4% at m = 16 on top of the documented σ. Oracle SQL that
    * mirrors an estimate must inline the SAME constant.
    */
  def alpha(mBits: Int): Double = mBits match {
    case 4 => 0.673
    case 5 => 0.697
    case 6 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / (1L << mBits).toDouble)
  }

  /** Append the HLL hash split of `item` as (bucket, rho) columns,
    * keeping every existing column — the shared observation builder
    * behind [[hllRegisters]], the streaming twin
    * ([[graft.streaming.StreamingHll]]), and the per-vertex
    * neighborhood sketch ([[Neighborhood]]).
    */
  def withHllParts(df: DataFrame, item: Column, mBits: Int): DataFrame = {
    require(mBits >= 4 && mBits <= 16, "mBits must be in [4, 16]")
    val wBits = 60 - mBits
    val wMod = 1L << wBits
    // NULL items are dropped here, not propagated: a null hash would
    // otherwise become a (null, null) register that silently corrupts
    // the harmonic denominator (count sees the row, sum skips it)
    df.filter(item.isNotNull)
      .withColumn("_h", Sketch.md5Prefix60(item))
      .withColumn("bucket", expr(s"_h div ${wMod}L"))
      .withColumn("rho",
        when(pmod(col("_h"), lit(wMod)) === 0L, lit((wBits + 1).toLong))
          .otherwise(lit((wBits + 1).toLong) -
            length(bin(pmod(col("_h"), lit(wMod)))).cast("long")))
      .drop("_h")
  }

  /** Non-empty HLL registers for `item`: (bucket, max_rho), bucket ∈
    * [0, 2^mBits), max_rho ∈ [1, 60−mBits+1]. Duplicates need not be
    * removed first (max absorbs them).
    */
  def hllRegisters(df: DataFrame, item: Column, mBits: Int): DataFrame =
    withHllParts(df.select(item.as("_item")), col("_item"), mBits)
      .groupBy("bucket").agg(max(col("rho")).as("max_rho"))

  /** Per-group HLL registers: (group, bucket, max_rho) — the grouped
    * deployment (distinct-cardinality per corpus slice). Identical
    * hash split, one map-side-combinable rollup; ≤ m rows per group.
    */
  def hllRegistersBy(df: DataFrame, group: Column, item: Column,
      mBits: Int): DataFrame =
    withHllParts(df.select(group.as("_grp"), item.as("_item")),
        col("_item"), mBits)
      .groupBy(col("_grp"), col("bucket"))
      .agg(max(col("rho")).as("max_rho"))

  /** Per-group exact scaled harmonic denominators from a grouped
    * register relation: (group, n_used, s_scaled) — one row per
    * group, every value exact BIGINT (the estimate division is left
    * to the caller so the grouped and global paths share one
    * formula).
    */
  def hllDenominatorBy(regs: DataFrame, group: Column,
      mBits: Int): DataFrame = {
    val wBits = 60 - mBits
    val m = 1L << mBits
    val top = 1L << (wBits + 1)
    regs.groupBy(group.as("_grp"))
      .agg(count(lit(1)).as("n_used"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(${wBits + 1} - max_rho AS INT))")).as("_s_used"))
      .select(col("_grp"),
        col("n_used"),
        (col("_s_used") + (lit(m) - col("n_used")) * lit(top))
          .as("s_scaled"))
  }

  /** One-row summary from a register relation: used-bucket count, the
    * EXACT scaled harmonic denominator
    * s_scaled = Σ 2^(wBits+1−M_j) (empty buckets contribute
    * 2^(wBits+1)), and the raw HLL estimate — a single fixed-shape
    * double expression over exact integers. Callers in the
    * small-range regime (est < 5m/2 with empty buckets) should apply
    * linear counting from `n_empty` instead; that correction is
    * log-based and deliberately left to the consumer.
    */
  def hllEstimate(regs: DataFrame, mBits: Int): DataFrame = {
    val wBits = 60 - mBits
    val m = 1L << mBits
    val top = 1L << (wBits + 1)
    regs
      .agg(count(lit(1)).as("n_used"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(${wBits + 1} - max_rho AS INT))")).as("_s_used"))
      .select(col("n_used"),
        (col("_s_used") + (lit(m) - col("n_used")) * lit(top))
          .as("s_scaled"),
        (lit(m) - col("n_used")).as("n_empty"))
      .select(col("n_used"), col("s_scaled"), col("n_empty"),
        (lit(alpha(mBits)) * lit((m * m).toDouble) *
          (lit(top.toDouble) / col("s_scaled").cast("double")))
          .as("estimate"))
  }
}
