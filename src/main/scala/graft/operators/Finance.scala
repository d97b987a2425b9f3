package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Price-series analytics beyond the reference's indicator stack
  * (stock_analysis.py computes MA/RSI/MACD only): maximum drawdown and
  * time-weighted average price — the two summary statistics a trading
  * dashboard reports next to the indicator panel.
  *
  * Exactness: drawdown is running-max (comparison-only) plus one fixed
  * arithmetic expression per row, so every output double is
  * hash-gateable; TWAP weights each close by its holding interval in
  * exact integer microseconds and accumulates the products in DECIMAL
  * (order-free), so the one double division happens once at the end —
  * the same decimal-accumulation contract as the q_agg_* oracles.
  */
object Finance {

  /** Per-symbol drawdown profile: `max_drawdown` (most negative
    * peak-relative dip, 0.0 for a monotone rise), `trough_ts` (earliest
    * order key attaining it), `n_underwater` (rows strictly below the
    * running peak), `n` rows.
    *
    * One window pass (running max + full-partition min reuse the same
    * symbol exchange/sort) then a hash aggregation.
    */
  def drawdownProfile(df: DataFrame, symbol: Column, ts: Column,
      close: Column): DataFrame = {
    // Rename FIRST, then window over the renamed attributes: windowing
    // over the originals and projecting after costs a second hash
    // exchange (the alias defeats the partitioning match), and an
    // unbound `(close − peak) / peak` evaluates the peak window twice.
    val w = Window.partitionBy(col("_sym")).orderBy(col("_ts"))
    df.select(symbol.as("_sym"), ts.as("_ts"), close.as("_close"))
      .withColumn("_peak", max(col("_close"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_dd",
        (col("_close") - col("_peak")) / col("_peak"))
      .withColumn("_mdd", min(col("_dd")).over(
        Window.partitionBy(col("_sym"))))
      .groupBy(col("_sym"))
      .agg(
        min(col("_dd")).as("max_drawdown"),
        min(when(col("_dd") === col("_mdd"), col("_ts"))).as("trough_ts"),
        sum(when(col("_dd") < 0.0, lit(1L)).otherwise(lit(0L)))
          .as("n_underwater"),
        count(lit(1)).as("n"))
  }

  /** Per-(symbol, day-of-week) seasonality profile: observation count,
    * day-of-week mean, and the deviation of that mean from the
    * symbol's overall mean — the classic calendar-effect feature
    * (plus a leakage-free seasonal baseline for anomaly gates).
    *
    * Exactness: day-of-week comes from pure epoch-µs integer
    * arithmetic (`(epoch_day + 3) % 7`, 0 = Monday) — no timestamp
    * conversion, so no timezone/calendar drift between engines — and
    * means come from exact fixed-point unit sums (same `scale`
    * contract as [[twap]]); the only FP steps are the two final
    * divisions and one subtraction, all fixed expressions.
    *
    * One hash aggregation on (symbol, dow) plus a 7-row-per-symbol
    * window for the overall mean — the window input is already tiny.
    */
  def seasonalProfile(df: DataFrame, symbol: Column, tsUs: Column,
      value: Column, scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, "scale must be in [0, 6]")
    val factor = math.pow(10.0, scale)
    val wSym = Window.partitionBy(col("_sym"))
    df.select(symbol.as("_sym"), tsUs.as("_tsu"),
        round(value.cast("double") * lit(factor)).cast("long").as("_units"))
      .withColumn("dow", expr("((_tsu DIV 86400000000) + 3) % 7"))
      .groupBy(col("_sym"), col("dow"))
      .agg(count(lit(1)).as("n"), sum(col("_units")).as("_du"))
      .withColumn("_tot_u", sum(col("_du")).over(wSym))
      .withColumn("_tot_n", sum(col("n")).over(wSym))
      .select(col("_sym"), col("dow"), col("n"),
        (col("_du").cast("double") /
          (col("n").cast("double") * lit(factor))).as("dow_mean"),
        (col("_du").cast("double") /
          (col("n").cast("double") * lit(factor)) -
         col("_tot_u").cast("double") /
          (col("_tot_n").cast("double") * lit(factor))).as("dev"))
  }

  /** Downsample a tick series to OHLCV bars: one row per
    * (symbol, bucket) with the bucket's first/highest/lowest/last
    * price and summed volume — the resample step every charting and
    * backtesting consumer runs before the indicator stack
    * (the reference's dashboard charts raw ticks, app.py:89-131; at
    * 100 TB nobody charts ticks).
    *
    * Exactness: every output price is SELECTED, never computed —
    * open/close via min_by/max_by on the (ts, price) struct (ties on
    * a duplicate timestamp resolve by price, the same lexicographic
    * struct comparison in both engines — min_by on the timestamp
    * alone would break ties by arrival order, which is
    * partition-dependent in Spark and would make the bar
    * non-deterministic), high/low via comparison-only min/max — so
    * doubles pass through bit-identical and the whole bar is
    * hash-gateable. Volume is an exact BIGINT sum.
    *
    * Scale shape: a single hash aggregation keyed on
    * (symbol, ts DIV bucket) with full map-side combine — ticks
    * collapse to bars before the shuffle, so the exchange carries one
    * row per output bar regardless of tick volume.
    */
  def ohlcResample(df: DataFrame, symbol: Column, tsUs: Column,
      close: Column, volume: Column, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    df.select(symbol.as("_sym"), tsUs.as("_tsu"), close.as("_close"),
        volume.as("_vol"))
      .groupBy(col("_sym"),
        expr(s"_tsu DIV ${bucketUs}L").as("_bucket"))
      .agg(
        min_by(col("_close"), struct(col("_tsu"), col("_close"))).as("open"),
        max(col("_close")).as("high"),
        min(col("_close")).as("low"),
        max_by(col("_close"), struct(col("_tsu"), col("_close"))).as("close"),
        sum(col("_vol")).as("volume"),
        count(lit(1)).as("n_ticks"))
      .withColumn("bucket_ts", col("_bucket") * lit(bucketUs))
      .select(col("_sym"), col("bucket_ts"), col("open"), col("high"),
        col("low"), col("close"), col("volume"), col("n_ticks"))
  }

  /** Per-(symbol, bucket) volume-weighted average price — [[twap]]'s
    * sibling with traded volume as the weight instead of holding time.
    *
    * Exactness: same fixed-point contract as [[twap]] — prices become
    * exact integer 10^scale units, `units·vol` accumulates in
    * DECIMAL(38,0) (order-free), and the single double division at the
    * end is the only FP step. Zero-volume buckets yield NULL vwap (the
    * 0/0 division is avoided on both engines by the same guard).
    *
    * Scale shape: one map-side-combinable hash aggregation on
    * (symbol, bucket); no window, no second exchange.
    */
  def vwap(df: DataFrame, symbol: Column, tsUs: Column, close: Column,
      volume: Column, bucketUs: Long, scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, "scale must be in [0, 6]")
    require(bucketUs > 0, "bucketUs must be positive")
    val factor = math.pow(10.0, scale)
    df.select(symbol.as("_sym"), tsUs.as("_tsu"),
        round(close.cast("double") * lit(factor)).cast("long").as("_units"),
        volume.cast("long").as("_vol"))
      .groupBy(col("_sym"), expr(s"_tsu DIV ${bucketUs}L").as("_bucket"))
      .agg(
        sum((col("_units") * col("_vol")).cast("decimal(38,0)")).as("_wsum"),
        sum(col("_vol")).as("volume"),
        count(lit(1)).as("n_ticks"))
      .withColumn("bucket_ts", col("_bucket") * lit(bucketUs))
      .select(col("_sym"), col("bucket_ts"),
        when(col("volume") > 0L,
          col("_wsum").cast("double") /
            (col("volume").cast("double") * lit(factor)))
          .as("vwap"),
        col("volume"), col("n_ticks"))
  }

  /** Two-sided CUSUM change-point chart per symbol (Page 1954): the
    * upward chart accumulates consecutive above-target drift
    * `s⁺ = max(0, s⁺ + (x − μ))`, the downward one below-target drift,
    * and either crossing `h` raises the alarm — the classic
    * mean-drift detector data pipelines run on quality metrics to
    * catch distribution shift (a rolling mean lags; CUSUM accumulates
    * small persistent drifts until they are undeniable).
    *
    * Target μ is the symbol's own exact fixed-point mean (same `scale`
    * unit contract as [[twap]]: one double division from exact integer
    * sums), so the chart asks "where did this series drift from its
    * overall level". The recursion runs in [[graft.functions.Cusum]] —
    * streaming O(1) window state, bit-reproducible.
    *
    * Shape: ONE hash exchange on symbol shared by the partition-frame
    * mean window and both ordered CUSUM windows (PlanAuditSpec pins
    * the single exchange).
    */
  def cusumChart(df: DataFrame, symbol: Column, ts: Column,
      close: Column, h: Double, scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, "scale must be in [0, 6]")
    val factor = math.pow(10.0, scale)
    val wSym = Window.partitionBy(col("_sym"))
    // NULL closes are dropped up front so the contract is explicit on
    // both engines: DuckDB's greatest() IGNORES a NULL argument (so a
    // NULL close would reset the oracle's recursion to 0) while the
    // Cusum window function carries state through it — filtering
    // removes the divergence instead of leaving it fixture-dependent.
    val base = df
      .select(symbol.as("_sym"), ts.as("_ts"), close.as("_close"))
      .filter(col("_close").isNotNull)
      .withColumn("_mu",
        sum(round(col("_close") * lit(factor)).cast("long")).over(wSym)
          .cast("double") /
          (count(lit(1)).over(wSym).cast("double") * lit(factor)))
    val up = graft.functions.Cusum.over(col("_close") - col("_mu"),
      Seq(col("_sym")), Seq(col("_ts")))
    val dn = graft.functions.Cusum.over(col("_mu") - col("_close"),
      Seq(col("_sym")), Seq(col("_ts")))
    base
      .withColumn("cusum_pos", up)
      .withColumn("cusum_neg", dn)
      .select(col("_sym"), col("_ts"), col("_close").as("close"),
        col("_mu").as("target"), col("cusum_pos"), col("cusum_neg"),
        (col("cusum_pos") > lit(h) || col("cusum_neg") > lit(h))
          .as("alarm"))
  }

  /** Per-symbol time-weighted average price over the closed holding
    * intervals: weight_i = ts_{i+1} − ts_i (exact integer µs; the last
    * observation has no closing interval and is excluded — the
    * standard left-closed TWAP convention).
    *
    * Exactness: `close` must be fixed-point with at most `scale`
    * decimals (price feeds are; the events fixture is 2-decimal).
    * Each price becomes an exact integer of 10^scale units, the
    * weighted sum `units·dt` is pure BIGINT accumulated in
    * DECIMAL(38,0) (order-free, overflow-free), and the single double
    * division at the end is the only FP step — a DOUBLE→DECIMAL
    * per-row rounding here would hash-diverge (engines disagree in the
    * final ulp on messy products; measured on this very query).
    */
  def twap(df: DataFrame, symbol: Column, ts: Column,
      close: Column, scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, "scale must be in [0, 6]")
    val factor = math.pow(10.0, scale)
    val w = Window.partitionBy(col("_sym")).orderBy(col("_ts"))
    df.select(symbol.as("_sym"), ts.as("_ts"), close.as("_close"))
      .withColumn("_dt",
        (lead(col("_ts"), 1).over(w) - col("_ts")).cast("long"))
      .filter(col("_dt").isNotNull)
      .withColumn("_units", round(col("_close") * lit(factor)).cast("long"))
      .groupBy(col("_sym"))
      .agg(
        sum((col("_units") * col("_dt")).cast("decimal(38,0)"))
          .as("_wsum"),
        sum(col("_dt")).as("span_us"),
        count(lit(1)).as("n_intervals"))
      .select(col("_sym"),
        (col("_wsum").cast("double") /
          (col("span_us").cast("double") * lit(factor))).as("twap"),
        col("span_us"), col("n_intervals"))
  }
}
