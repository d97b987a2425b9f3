package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier profiling: exact median, exact MAD (median
  * absolute deviation) and the count of rows outside `med ± k·MAD` —
  * the standard robust-z-score gate (|v − med| > k·MAD) that survives
  * the heavy-tailed measure columns a mean/stddev z-score is wrecked
  * by. A training-data pipeline uses this shape to drop metric
  * outliers (absurd lengths, corrupt scores) without a tunable
  * per-source threshold.
  *
  * Both medians go through [[Quantiles.exactQuantilesHist]] — (group,
  * value)-count aggregation then a window over DISTINCT values — so
  * the full-row per-group sort a naive median needs never happens and
  * the scan runs at full parallelism (see Quantiles' scale note). The
  * deviation pass re-joins the per-group median: group cardinality is
  * tiny relative to rows, so the joins broadcast under AQE.
  *
  * Exactness: the PERCENTILE_CONT interpolation is a fixed expression
  * tree (Quantiles), `abs(v − med)` and the `k·MAD` comparison are
  * single IEEE ops — the whole profile is hash-gateable, and the
  * oracle mirrors the rank-based formulation (same value multiset ⇒
  * same element at every rank, tie order irrelevant).
  */
object Robust {

  /** One row per group: `med, mad, n, n_outliers` (outlier ⇔
    * |v − med| > k·MAD). NULL values are excluded (the aggregate
    * contract — and the rank-parity requirement, see Quantiles).
    */
  /** Winsorization: clip `value` to its exact per-group continuous
    * [`lo`, `hi`] quantiles (PERCENTILE_CONT interpolation, see
    * Quantiles) and flag the clipped rows — the bounded-influence
    * alternative to dropping outliers. All original columns pass
    * through; NULL values are excluded. The bounds relation is one row
    * per group, so the back-join broadcasts under AQE.
    */
  def winsorize(df: DataFrame, group: Column, value: Column,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo < hi, "need 0 <= lo < hi <= 1")
    val vd = value.cast("double")
    val base = df.filter(vd.isNotNull)
    val (pLo, pHi) =
      (math.round(lo * 100).toInt, math.round(hi * 100).toInt)
    val bounds = Quantiles.exactQuantilesHist(base, group, vd, Seq(lo, hi))
      .select(col("_g"), col(s"p${pLo}_cont").as("_plo"),
        col(s"p${pHi}_cont").as("_phi"))
    base.join(bounds, group === col("_g"))
      .withColumn("winsorized",
        least(greatest(vd, col("_plo")), col("_phi")))
      .withColumn("clipped", vd < col("_plo") || vd > col("_phi"))
      .drop("_g", "_plo", "_phi")
  }

  /** Rolling robust anomaly band: per-group ROWS-frame discrete median
    * and discrete MAD of the trailing `frame` observations, plus the
    * |v − med| > k·MAD anomaly flag — the denoising/outlier detector
    * that survives level shifts and fat tails where a rolling
    * mean/stddev band (Bollinger) is dragged by the outliers it is
    * supposed to flag.
    *
    * "Discrete" median = the sorted frame's element at 1-based rank
    * ⌈n/2⌉ (no interpolation): every output is an element of the frame
    * or one abs-difference of two elements, so the whole band is
    * hash-gateable — the oracle picks the identical ranked element from
    * the identical frame (frame membership is deterministic because
    * `order` is unique per group, the engine-ordering contract every
    * window query here shares).
    *
    * Scale: one hash exchange on the group key, one sort, and a
    * per-row frame copy of `frame` doubles — O(frame·log frame) per
    * row with bounded memory, the same cost class as any rows-frame
    * aggregate. The frame constant is the knob: it never grows with
    * data size, so the plan at 100 TB is the q_ind_* plan. NULL values
    * are excluded before framing (Spark's collect_list drops NULLs
    * mid-frame while SQL `list()` keeps them — the filter makes both
    * engines frame the same multiset).
    */
  def rollingRobust(df: DataFrame, group: Column, order: Column,
      value: Column, frame: Int = 15, k: Double = 3.0): DataFrame = {
    require(frame >= 1, "frame must be >= 1")
    val vd = value.cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(order)
      .rowsBetween(-(frame - 1L), 0L)
    def ranked(arr: Column): Column =
      element_at(arr, ceil(size(arr) / lit(2.0)).cast("int"))
    val sorted = array_sort(collect_list(vd).over(w))
    df.filter(vd.isNotNull)
      .withColumn("_fr", sorted)
      .withColumn("roll_med", ranked(col("_fr")))
      .withColumn("roll_mad",
        ranked(array_sort(transform(col("_fr"),
          x => abs(x - col("roll_med"))))))
      .withColumn("is_anomaly",
        abs(vd - col("roll_med")) > lit(k) * col("roll_mad"))
      .drop("_fr")
  }

  def madProfile(df: DataFrame, group: Column, value: Column,
      k: Double = 3.0): DataFrame = {
    val base = df.select(group.as("_g"), value.cast("double").as("_v"))
      .filter(col("_v").isNotNull)
    val med = Quantiles.exactQuantilesHist(base, col("_g"), col("_v"),
        Seq(0.5))
      .select(col("_g"), col("p50_cont").as("med"))
    val withDev = base.join(med, "_g")
      .withColumn("_ad", abs(col("_v") - col("med")))
    val mad = Quantiles.exactQuantilesHist(withDev, col("_g"), col("_ad"),
        Seq(0.5))
      .select(col("_g"), col("p50_cont").as("mad"))
    withDev.join(mad, "_g")
      .groupBy(col("_g"))
      .agg(
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("_ad") > lit(k) * col("mad"), lit(1L))
          .otherwise(lit(0L))).as("n_outliers"))
  }
}
