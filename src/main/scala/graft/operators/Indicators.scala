package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Ema

/** The reference engine's analytical core — per-symbol ordered technical
  * indicators + rule-based suggestion — re-expressed as one declarative
  * Spark window pipeline.
  *
  * The reference computes all of this in single-threaded driver pandas
  * inside `foreachBatch` (/root/reference/spark/stock_analysis.py:144-268).
  * Here every step is a native window expression over
  * `Window.partitionBy(symbol).orderBy(order…)`: Catalyst plans ONE
  * shuffle on the symbol key and ONE sort per partition, shared by all
  * frames (MA5/MA20/RSI lags and both EMA recursions) — WindowExec spills
  * via UnsafeExternalSorter, so the pipeline scales to arbitrarily many
  * symbols × arbitrarily long histories with no driver involvement.
  *
  * Replicated reference quirks (SURVEY.md §2.9):
  *  - Q1: `rs = where(loss==0, 0, gain/loss)` → RSI = 0 (not 100) on a
  *    monotone rise (stock_analysis.py:182).
  *  - Q2: pandas `rolling(n).mean()` min_periods → null until a full
  *    frame. We build rolling means as explicit lag-chains
  *    `(lag(x,n-1)+…+lag(x,1)+x)/n`, so a partial frame contains a null
  *    lag and the whole mean nulls out — exactly min_periods, and with a
  *    *fixed* FP association order (left-to-right), which makes results
  *    bit-identical to any engine evaluating the same expression text
  *    (the DuckDB oracle does).
  *  - Q3: first-row `diff()` NaN is coerced to 0 before clipping
  *    (`delta.where(cond, 0)` replaces on False OR NaN), so the first
  *    RSI window includes an artificial 0 (stock_analysis.py:177-179) →
  *    `coalesce(delta, 0)`.
  *  - Q4: EMA `adjust=False` seeded with the group's first value — the
  *    custom [[graft.functions.Ema]] window function.
  *  - Q5/Q6: null indicator rows fall through every `when` to the
  *    default 'HOLD' (np.select NaN-condition semantics), and condition
  *    order is preserved first-match.
  */
object Indicators {

  /** Rolling mean over the last `n` rows (current row inclusive) with
    * pandas `min_periods=n` semantics, as a left-associated lag-chain:
    * `(lag(x,n-1) + lag(x,n-2) + … + lag(x,1) + x) / n`.
    * Null until the frame is full (lag past the partition start is null
    * and null propagates through `+`).
    */
  def rollingMean(x: Column, n: Int, w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val terms = ((n - 1) to 1 by -1).map(k => lag(x, k).over(w)) :+ x
    terms.reduceLeft(_ + _) / lit(n.toDouble)
  }

  /** Vietnamese reason strings, byte-for-byte from
    * /root/reference/spark/stock_analysis.py:219-224.
    */
  val ReasonBuy =
    "Xu hướng tăng (MA5 > MA20). RSI chưa quá mua. MACD tích cực (MACD > Signal). Đề xuất: MUA - Xu hướng tăng, RSI chưa quá mua, MACD tích cực."
  val ReasonHoldSell =
    "Xu hướng tăng (MA5 > MA20). Quá mua (RSI > 70). Đề xuất: CÂN NHẮC BÁN - Thị trường có dấu hiệu quá mua."
  val ReasonWatchBuy =
    "Xu hướng giảm (MA5 < MA20). Quá bán (RSI < 30). MACD tích cực (MACD > Signal). Đề xuất: THEO DÕI/MUA - Thị trường đang quá bán, có dấu hiệu đảo chiều."
  val ReasonSellAvoid =
    "Xu hướng giảm (MA5 < MA20). MACD tiêu cực (MACD < Signal). Đề xuất: BÁN/TRÁNH - Xu hướng giảm, MACD tiêu cực."
  val ReasonHold =
    "Xu hướng trung tính. Đề xuất: GIỮ - Chờ tín hiệu rõ ràng hơn."

  /** Moving-average stage: append `ma5, ma20` (Q2). */
  def addMa(df: DataFrame, symbol: Column, order: Seq[Column], close: Column): DataFrame = {
    val w = Window.partitionBy(symbol).orderBy(order: _*)
    df.withColumn("ma5", rollingMean(close, 5, w))
      .withColumn("ma20", rollingMean(close, 20, w))
  }

  /** RSI-14 stage: append `rsi` (Q1, Q3). */
  def addRsi(df: DataFrame, symbol: Column, order: Seq[Column], close: Column): DataFrame = {
    val w = Window.partitionBy(symbol).orderBy(order: _*)
    val delta = coalesce(close - lag(close, 1).over(w), lit(0.0))
    val withAvgGl = df
      .withColumn("_gain", when(delta > 0.0, delta).otherwise(lit(0.0)))
      .withColumn("_loss", when(delta < 0.0, -delta).otherwise(lit(0.0)))
      .withColumn("_avg_gain", rollingMean(col("_gain"), 14, w))
      .withColumn("_avg_loss", rollingMean(col("_loss"), 14, w))
    val rs = when(col("_avg_loss") === 0.0, lit(0.0))
      .otherwise(col("_avg_gain") / col("_avg_loss"))
    withAvgGl
      .withColumn("rsi", lit(100.0) - (lit(100.0) / (lit(1.0) + rs)))
      .drop("_gain", "_loss", "_avg_gain", "_avg_loss")
  }

  /** MACD(12,26,9) stage: append `macd_line, macd_signal, macd_histogram`
    * (Q4). Nested window expressions: Catalyst plans a second/third
    * WindowExec but the child's (hash-partitioned by symbol, sorted)
    * distribution already satisfies the requirement — no extra shuffle
    * or sort.
    */
  def addMacd(df: DataFrame, symbol: Column, order: Seq[Column], close: Column): DataFrame =
    df.withColumn("macd_line",
        Ema.emaSpan(close, 12, Seq(symbol), order) -
          Ema.emaSpan(close, 26, Seq(symbol), order))
      .withColumn("macd_signal",
        Ema.emaSpan(col("macd_line"), 9, Seq(symbol), order))
      .withColumn("macd_histogram", col("macd_line") - col("macd_signal"))

  /** Bollinger stage: append `bb_mid, bb_sd, bb_upper, bb_lower, pct_b`
    * — the classic BB(n, width) band family over the close series, the
    * natural next indicator after the reference's MA/RSI/MACD stack
    * (same per-symbol window shuffle; stock_analysis.py:144-268 is the
    * pipeline this extends).
    *
    * Exactness contract: the rolling stddev is NOT `stddev(...)` over a
    * frame (engines disagree on accumulation order), but the explicit
    * left-associated sum of squared deviations from `bb_mid` over the
    * same lag-chain as [[rollingMean]], `/ (n-1)` (sample variance,
    * pandas `rolling(n).std()` ddof=1), then IEEE `sqrt` — a fixed
    * expression tree both engines evaluate identically, and null until
    * the frame fills (min_periods, null lag poisons the sum). `pct_b`
    * is null when the band is degenerate (sd = 0 — pandas emits NaN
    * from 0/0 there; we contract null, and the oracle mirrors it).
    */
  def addBollinger(df: DataFrame, symbol: Column, order: Seq[Column],
      close: Column, n: Int = 20, width: Double = 2.0): DataFrame = {
    require(n >= 2, "bollinger window must be >= 2")
    val w = Window.partitionBy(symbol).orderBy(order: _*)
    val withMid = df.withColumn("bb_mid", rollingMean(close, n, w))
    val terms = ((n - 1) to 1 by -1).map(k => lag(close, k).over(w)) :+ close
    val sqDevs = terms.map(t => (t - col("bb_mid")) * (t - col("bb_mid")))
    val variance = sqDevs.reduceLeft(_ + _) / lit((n - 1).toDouble)
    withMid
      .withColumn("bb_sd", sqrt(variance))
      .withColumn("bb_upper", col("bb_mid") + lit(width) * col("bb_sd"))
      .withColumn("bb_lower", col("bb_mid") - lit(width) * col("bb_sd"))
      .withColumn("pct_b",
        when(col("bb_upper") =!= col("bb_lower"),
          (close - col("bb_lower")) /
            (col("bb_upper") - col("bb_lower"))))
  }

  /** Stochastic-oscillator stage: append `stoch_k, stoch_d` —
    * %K = 100·(close − min_n) / (max_n − min_n) over the trailing `n`
    * rows, %D = SMA(`dPeriod`) of %K. Close-only variant (the events
    * fixture carries no high/low series; with OHLC data the same frame
    * takes `min(low)`/`max(high)`).
    *
    * min/max over a row frame are comparison-only (engine-exact), and
    * the %K arithmetic is one fixed expression, so the whole stage is
    * hash-gateable. min_periods: the frame's row count must equal `n`
    * (pandas `rolling(n).min()` nulls a partial frame — Spark's frame
    * min doesn't, so the count gate reproduces it). A flat window
    * (max = min) yields %K = 0 by contract (pandas: NaN from 0/0);
    * the oracle mirrors the CASE.
    */
  def addStochastic(df: DataFrame, symbol: Column, order: Seq[Column],
      close: Column, n: Int = 14, dPeriod: Int = 3): DataFrame = {
    require(n >= 1 && dPeriod >= 1, "stochastic periods must be >= 1")
    val w = Window.partitionBy(symbol).orderBy(order: _*)
    val frame = w.rowsBetween(-(n - 1), 0)
    val full = count(lit(1)).over(frame) === n
    val lo = min(close).over(frame)
    val hi = max(close).over(frame)
    df.withColumn("stoch_k",
        when(full && hi > lo, lit(100.0) * (close - lo) / (hi - lo))
          .when(full && hi === lo, lit(0.0)))
      .withColumn("stoch_d", rollingMean(col("stoch_k"), dPeriod, w))
  }

  /** Decision stage: append `suggestion, reason` from the indicator
    * columns (Q5, Q6) — stock_analysis.py:194-224.
    */
  def addSuggestion(df: DataFrame): DataFrame = {
    val c1 = col("ma5") > col("ma20") && col("rsi") < 70.0 &&
      col("macd_line") > col("macd_signal")
    val c2 = col("ma5") > col("ma20") && col("rsi") >= 70.0
    val c3 = col("ma5") < col("ma20") && col("rsi") <= 30.0 &&
      col("macd_line") > col("macd_signal")
    val c4 = col("ma5") < col("ma20") &&
      col("macd_line") <= col("macd_signal")

    df.withColumn("suggestion",
        when(c1, "BUY").when(c2, "HOLD/SELL").when(c3, "WATCH/BUY")
          .when(c4, "SELL/AVOID").otherwise("HOLD"))
      .withColumn("reason",
        when(c1, ReasonBuy).when(c2, ReasonHoldSell).when(c3, ReasonWatchBuy)
          .when(c4, ReasonSellAvoid).otherwise(ReasonHold))
  }

  /** Full pipeline: append `ma5, ma20, rsi, macd_line, macd_signal,
    * macd_histogram, suggestion, reason` to `df`.
    *
    * @param symbol the grouping key column (reference: stock symbol)
    * @param order  ordering columns within a symbol (reference: date;
    *               pass a unique tiebreaker for determinism)
    * @param close  the price series column
    */
  def enrich(df: DataFrame, symbol: Column, order: Seq[Column], close: Column): DataFrame =
    addSuggestion(
      addMacd(addRsi(addMa(df, symbol, order, close), symbol, order, close),
        symbol, order, close))
}
