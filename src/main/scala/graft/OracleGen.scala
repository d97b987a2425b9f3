package graft

import graft.operators.Indicators

/** Programmatic generators for the DuckDB oracle SQL in
  * [[SparkEntry.oracleSql]].
  *
  * The driver hash-compares our parquet output to DuckDB's result for
  * the same SQL. Double columns only match reliably if both engines
  * perform the SAME IEEE-754 operations in the SAME order, so:
  *
  *  - rolling means are emitted as the same left-associated lag-chain
  *    the Spark side builds (`Indicators.rollingMean`);
  *  - EMA/MACD use a recursive CTE computing the identical recursion
  *    `alpha*x + (1-alpha)*e` (same operand order as
  *    [[graft.functions.Ema]]);
  *  - order-sensitive reductions over many rows (SUM/AVG of doubles)
  *    go through exact DECIMAL accumulation then one cast to DOUBLE
  *    (see the q_agg_* oracle strings in SparkEntry).
  *
  * Generating the SQL from the same parameters as the Spark pipeline
  * keeps the two sides structurally in sync.
  */
object OracleGen {

  /** Left-associated lag-chain rolling mean — SQL twin of
    * [[Indicators.rollingMean]].
    */
  def lagChainMean(col: String, n: Int, w: String): String = {
    val terms = ((n - 1) to 1 by -1).map(k => s"lag($col, $k) OVER $w") :+ col
    terms.mkString("(", " + ", s") / $n.0")
  }

  private def alphaSql(span: Int): (String, String) =
    (s"(2.0/${span + 1}.0)", s"(1.0 - 2.0/${span + 1}.0)")

  /** The events table viewed as a per-symbol price series:
    * symbol = user_id (int64), ts = epoch-microseconds (int64 — DuckDB's
    * parquet reader keeps µs precision; Spark side truncates its ns read
    * with `ts DIV 1000` to match), close = value.
    */
  val eventsBase: String =
    """base AS (
      |  SELECT user_id AS symbol, epoch_us(ts) AS ts, value AS close,
      |         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS rn
      |  FROM events
      |)""".stripMargin

  private val W = "(PARTITION BY symbol ORDER BY ts)"

  /** CTE layers computing delta/gain/loss then MA5/MA20/RSI-14 with the
    * reference quirks Q1–Q3 (see Indicators.scala).
    */
  // NOTE: window names are unique per CTE (wd/wm) — under WITH RECURSIVE
  // DuckDB scopes named WINDOW clauses globally and rejects a duplicate
  // `WINDOW w` across CTEs ("window w is already defined").
  val maRsiLayers: String = {
    val ma5 = lagChainMean("close", 5, "wm")
    val ma20 = lagChainMean("close", 20, "wm")
    val ag = lagChainMean("gain", 14, "wm")
    val al = lagChainMean("lossv", 14, "wm")
    s"""d AS (
       |  SELECT *, COALESCE(close - lag(close, 1) OVER wd, 0.0) AS delta
       |  FROM base WINDOW wd AS $W
       |),
       |g AS (
       |  SELECT *,
       |    CASE WHEN delta > 0.0 THEN delta ELSE 0.0 END AS gain,
       |    CASE WHEN delta < 0.0 THEN -delta ELSE 0.0 END AS lossv
       |  FROM d
       |),
       |m AS (
       |  SELECT *,
       |    $ma5 AS ma5,
       |    $ma20 AS ma20,
       |    $ag AS avg_gain,
       |    $al AS avg_loss
       |  FROM g WINDOW wm AS $W
       |),
       |r AS (
       |  SELECT *,
       |    100.0 - (100.0 / (1.0 + CASE WHEN avg_loss = 0.0 THEN 0.0 ELSE avg_gain / avg_loss END)) AS rsi
       |  FROM m
       |)""".stripMargin
  }

  /** Recursive CTE computing EMA12/EMA26 and the MACD signal EMA in one
    * pass — the exact recursion of [[graft.functions.Ema]]:
    * seed e_1 = x_1 (assignment), s_1 = e12_1 - e26_1 = 0.0;
    * e_t = alpha*x_t + (1-alpha)*e_{t-1}.
    */
  val macdRec: String = {
    val (a12, b12) = alphaSql(12)
    val (a26, b26) = alphaSql(26)
    val (a9, b9) = alphaSql(9)
    val e12 = s"$a12*b.close + $b12*r.ema12"
    val e26 = s"$a26*b.close + $b26*r.ema26"
    s"""rec AS (
       |  SELECT symbol, ts, rn, close AS ema12, close AS ema26,
       |         CAST(0.0 AS DOUBLE) AS sig
       |  FROM base WHERE rn = 1
       |  UNION ALL
       |  SELECT b.symbol, b.ts, b.rn,
       |    $e12,
       |    $e26,
       |    $a9*(($e12) - ($e26)) + $b9*r.sig
       |  FROM base b JOIN rec r ON b.symbol = r.symbol AND b.rn = r.rn + 1
       |),
       |mc AS (
       |  SELECT symbol, ts, ema12 - ema26 AS macd_line, sig AS macd_signal,
       |         (ema12 - ema26) - sig AS macd_histogram
       |  FROM rec
       |)""".stripMargin
  }

  /** Suggestion + reason CASE chains (first-match, NULL conditions fall
    * through to the default — np.select semantics, stock_analysis.py:194-224).
    */
  val suggestionCase: String = {
    def esc(s: String) = s.replace("'", "''")
    val c1 = "(ma5 > ma20 AND rsi < 70.0 AND macd_line > macd_signal)"
    val c2 = "(ma5 > ma20 AND rsi >= 70.0)"
    val c3 = "(ma5 < ma20 AND rsi <= 30.0 AND macd_line > macd_signal)"
    val c4 = "(ma5 < ma20 AND macd_line <= macd_signal)"
    s"""CASE WHEN $c1 THEN 'BUY' WHEN $c2 THEN 'HOLD/SELL'
       |     WHEN $c3 THEN 'WATCH/BUY' WHEN $c4 THEN 'SELL/AVOID'
       |     ELSE 'HOLD' END AS suggestion,
       |CASE WHEN $c1 THEN '${esc(Indicators.ReasonBuy)}'
       |     WHEN $c2 THEN '${esc(Indicators.ReasonHoldSell)}'
       |     WHEN $c3 THEN '${esc(Indicators.ReasonWatchBuy)}'
       |     WHEN $c4 THEN '${esc(Indicators.ReasonSellAvoid)}'
       |     ELSE '${esc(Indicators.ReasonHold)}' END AS reason""".stripMargin
  }

  /** Left-associated lag-chain sum of squared deviations from `mid` —
    * SQL twin of the variance numerator in [[Indicators.addBollinger]].
    */
  def lagChainSqDev(col: String, mid: String, n: Int, w: String): String = {
    val terms = ((n - 1) to 1 by -1).map(k => s"lag($col, $k) OVER $w") :+ col
    terms.map(t => s"($t - $mid) * ($t - $mid)").mkString("(", " + ", ")")
  }

  val qIndBbands: String = {
    val mid = lagChainMean("close", 20, "wb1")
    val sq = lagChainSqDev("close", "bb_mid", 20, "wb2")
    s"""WITH $eventsBase,
       |b1 AS (
       |  SELECT *, $mid AS bb_mid
       |  FROM base WINDOW wb1 AS $W
       |),
       |b2 AS (
       |  SELECT *, sqrt($sq / 19.0) AS bb_sd
       |  FROM b1 WINDOW wb2 AS $W
       |),
       |b3 AS (
       |  SELECT *, bb_mid + 2.0 * bb_sd AS bb_upper,
       |            bb_mid - 2.0 * bb_sd AS bb_lower
       |  FROM b2
       |)
       |SELECT symbol, ts, close, bb_mid, bb_sd, bb_upper, bb_lower,
       |  CASE WHEN bb_upper <> bb_lower
       |       THEN (close - bb_lower) / (bb_upper - bb_lower) END AS pct_b
       |FROM b3
       |ORDER BY symbol, ts""".stripMargin
  }

  val qIndStoch: String = {
    val d = lagChainMean("stoch_k", 3, "ws3")
    s"""WITH $eventsBase,
       |s1 AS (
       |  SELECT *, count(*) OVER wf AS cf,
       |         min(close) OVER wf AS lo14, max(close) OVER wf AS hi14
       |  FROM base
       |  WINDOW wf AS (PARTITION BY symbol ORDER BY ts
       |                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
       |),
       |s2 AS (
       |  SELECT *,
       |    CASE WHEN cf = 14 AND hi14 > lo14
       |           THEN 100.0 * (close - lo14) / (hi14 - lo14)
       |         WHEN cf = 14 AND hi14 = lo14 THEN 0.0 END AS stoch_k
       |  FROM s1
       |),
       |s3 AS (
       |  SELECT *, $d AS stoch_d
       |  FROM s2 WINDOW ws3 AS $W
       |)
       |SELECT symbol, ts, close, stoch_k, stoch_d
       |FROM s3
       |ORDER BY symbol, ts""".stripMargin
  }

  val qDrawdown: String =
    s"""WITH $eventsBase,
       |p AS (
       |  SELECT *, max(close) OVER (PARTITION BY symbol ORDER BY ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
       |  FROM base
       |),
       |d AS (SELECT symbol, ts, (close - peak) / peak AS dd FROM p),
       |m AS (SELECT *, min(dd) OVER (PARTITION BY symbol) AS mdd FROM d)
       |SELECT symbol, min(dd) AS max_drawdown,
       |  min(CASE WHEN dd = mdd THEN ts END) AS trough_ts,
       |  CAST(sum(CASE WHEN dd < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_underwater,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM m GROUP BY symbol ORDER BY symbol""".stripMargin

  val qCusum: String =
    s"""WITH RECURSIVE $eventsBase,
       |u AS (SELECT symbol, ts, close,
       |  row_number() OVER (PARTITION BY symbol ORDER BY ts) AS rn,
       |  CAST(round(close * 100.0) AS BIGINT) AS units
       |  FROM base WHERE close IS NOT NULL),
       |m AS (SELECT symbol, CAST(sum(units) AS BIGINT) AS su,
       |  CAST(count(*) AS BIGINT) AS n FROM u GROUP BY symbol),
       |b2 AS (SELECT u.symbol, u.ts, u.rn, u.close,
       |  CAST(m.su AS DOUBLE) / (CAST(m.n AS DOUBLE) * 100.0) AS mu
       |  FROM u JOIN m USING (symbol)),
       |rec AS (
       |  SELECT symbol, ts, rn, close, mu,
       |    greatest(0.0, close - mu) AS cp,
       |    greatest(0.0, mu - close) AS cn
       |  FROM b2 WHERE rn = 1
       |  UNION ALL
       |  SELECT b.symbol, b.ts, b.rn, b.close, b.mu,
       |    greatest(0.0, r.cp + (b.close - b.mu)),
       |    greatest(0.0, r.cn + (b.mu - b.close))
       |  FROM b2 b JOIN rec r ON b.symbol = r.symbol AND b.rn = r.rn + 1
       |)
       |SELECT symbol, ts, close, mu AS target, cp AS cusum_pos,
       |  cn AS cusum_neg, (cp > 100.0 OR cn > 100.0) AS alarm
       |FROM rec ORDER BY symbol, ts""".stripMargin

  /** Tick base with the props.k volume — mirror of SparkEntry.ticks. */
  val ticksBase: String =
    """tk AS (
      |  SELECT user_id AS symbol, epoch_us(ts) AS tsu, value AS close,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS vol
      |  FROM events
      |)""".stripMargin

  val qResampleOhlc: String =
    s"""WITH $ticksBase
       |SELECT symbol, (tsu // 3600000000) * 3600000000 AS bucket_ts,
       |  first(close ORDER BY tsu, close) AS open,
       |  max(close) AS high,
       |  min(close) AS low,
       |  last(close ORDER BY tsu, close) AS close,
       |  CAST(sum(vol) AS BIGINT) AS volume,
       |  CAST(count(*) AS BIGINT) AS n_ticks
       |FROM tk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val qVwap: String =
    s"""WITH $ticksBase,
       |g AS (
       |  SELECT symbol, (tsu // 86400000000) * 86400000000 AS bucket_ts,
       |    sum(CAST(CAST(round(close * 100.0) AS BIGINT) * vol
       |        AS DECIMAL(38,0))) AS wsum,
       |    CAST(sum(vol) AS BIGINT) AS volume,
       |    CAST(count(*) AS BIGINT) AS n_ticks
       |  FROM tk GROUP BY 1, 2
       |)
       |SELECT symbol, bucket_ts,
       |  CASE WHEN volume > 0 THEN
       |    CAST(wsum AS DOUBLE) / (CAST(volume AS DOUBLE) * 100.0)
       |  END AS vwap,
       |  volume, n_ticks
       |FROM g ORDER BY symbol, bucket_ts""".stripMargin

  val qTwap: String =
    s"""WITH $eventsBase,
       |t AS (
       |  SELECT symbol, ts, close,
       |    lead(ts) OVER (PARTITION BY symbol ORDER BY ts) - ts AS dt
       |  FROM base
       |),
       |f AS (SELECT symbol,
       |  CAST(round(close * 100.0) AS BIGINT) AS units, dt
       |  FROM t WHERE dt IS NOT NULL)
       |SELECT symbol,
       |  CAST(sum(CAST(units * dt AS DECIMAL(38,0))) AS DOUBLE)
       |    / (CAST(sum(dt) AS DOUBLE) * 100.0) AS twap,
       |  CAST(sum(dt) AS BIGINT) AS span_us,
       |  CAST(count(*) AS BIGINT) AS n_intervals
       |FROM f GROUP BY symbol ORDER BY symbol""".stripMargin

  val qSeasonal: String =
    s"""WITH $eventsBase,
       |u AS (SELECT symbol, ts,
       |  CAST(round(close * 100.0) AS BIGINT) AS units FROM base),
       |d AS (SELECT symbol, ((ts // 86400000000) + 3) % 7 AS dow, units
       |      FROM u),
       |g AS (SELECT symbol, dow, CAST(count(*) AS BIGINT) AS n,
       |      CAST(sum(units) AS BIGINT) AS du
       |      FROM d GROUP BY symbol, dow),
       |w AS (SELECT *,
       |      CAST(sum(du) OVER (PARTITION BY symbol) AS BIGINT) AS tot_u,
       |      CAST(sum(n) OVER (PARTITION BY symbol) AS BIGINT) AS tot_n
       |      FROM g)
       |SELECT symbol, dow, n,
       |  CAST(du AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS dow_mean,
       |  CAST(du AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0)
       |    - CAST(tot_u AS DOUBLE) / (CAST(tot_n AS DOUBLE) * 100.0) AS dev
       |FROM w ORDER BY symbol, dow""".stripMargin

  val qIndMa: String =
    s"""WITH $eventsBase
       |SELECT symbol, ts, close,
       |  ${lagChainMean("close", 5, "w")} AS ma5,
       |  ${lagChainMean("close", 20, "w")} AS ma20
       |FROM base WINDOW w AS $W
       |ORDER BY symbol, ts""".stripMargin

  val qIndRsi: String =
    s"""WITH $eventsBase,
       |$maRsiLayers
       |SELECT symbol, ts, close, rsi
       |FROM r
       |ORDER BY symbol, ts""".stripMargin

  val qIndMacd: String =
    s"""WITH RECURSIVE $eventsBase,
       |$macdRec
       |SELECT symbol, ts, macd_line, macd_signal, macd_histogram
       |FROM mc
       |ORDER BY symbol, ts""".stripMargin

  val qIndFull: String =
    s"""WITH RECURSIVE $eventsBase,
       |$maRsiLayers,
       |$macdRec
       |SELECT r.symbol, r.ts, r.close, r.ma5, r.ma20, r.rsi,
       |  mc.macd_line, mc.macd_signal, mc.macd_histogram,
       |  $suggestionCase
       |FROM r JOIN mc ON r.symbol = mc.symbol AND r.ts = mc.ts
       |ORDER BY r.symbol, r.ts""".stripMargin

  /** Dashboard read path (app.py:89-131, 363-428): the latest bar per
    * symbol with its suggestion/reason (null-defaulted exactly like the
    * dashboard's .get fallbacks), the panel derivations (suggestion
    * color, RSI zone label, MACD delta + delta color), and the previous
    * four closes for the chart tail.
    */
  val qDashboardFeed: String =
    s"""WITH RECURSIVE $eventsBase,
       |$maRsiLayers,
       |$macdRec,
       |enr AS (
       |  SELECT r.symbol, r.ts, r.close, r.ma5, r.ma20, r.rsi,
       |    mc.macd_line, mc.macd_signal, mc.macd_histogram,
       |    $suggestionCase
       |  FROM r JOIN mc ON r.symbol = mc.symbol AND r.ts = mc.ts
       |),
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY ts DESC) AS rk
       |  FROM enr
       |),
       |last AS (
       |  SELECT symbol,
       |    max(CASE WHEN rk = 1 THEN ts END) AS last_ts,
       |    max(CASE WHEN rk = 1 THEN close END) AS current_price,
       |    max(CASE WHEN rk = 1 THEN ma5 END) AS ma5,
       |    max(CASE WHEN rk = 1 THEN ma20 END) AS ma20,
       |    max(CASE WHEN rk = 1 THEN rsi END) AS rsi,
       |    max(CASE WHEN rk = 1 THEN macd_line END) AS macd_line,
       |    max(CASE WHEN rk = 1 THEN macd_signal END) AS macd_signal,
       |    max(CASE WHEN rk = 1 THEN macd_histogram END) AS macd_histogram,
       |    max(CASE WHEN rk = 1 THEN suggestion END) AS suggestion_raw,
       |    max(CASE WHEN rk = 1 THEN reason END) AS reason_raw,
       |    max(CASE WHEN rk = 2 THEN close END) AS close_t1,
       |    max(CASE WHEN rk = 3 THEN close END) AS close_t2,
       |    max(CASE WHEN rk = 4 THEN close END) AS close_t3,
       |    max(CASE WHEN rk = 5 THEN close END) AS close_t4
       |  FROM rk WHERE rk <= 5 GROUP BY symbol
       |)
       |SELECT symbol, last_ts, current_price, ma5, ma20, rsi,
       |  macd_line, macd_signal, macd_histogram,
       |  COALESCE(suggestion_raw, 'KHÔNG CÓ ĐỀ XUẤT') AS suggestion,
       |  COALESCE(reason_raw, 'Không có đủ dữ liệu') AS reason,
       |  CASE WHEN suggestion_raw LIKE '%BUY%' THEN 'green'
       |       WHEN suggestion_raw LIKE '%SELL%' THEN 'red'
       |       ELSE 'orange' END AS suggestion_color,
       |  CASE WHEN rsi IS NULL THEN 'RSI'
       |       WHEN rsi > 70.0 THEN 'RSI (Quá mua > 70)'
       |       WHEN rsi < 30.0 THEN 'RSI (Quá bán < 30)'
       |       ELSE 'RSI' END AS rsi_label,
       |  macd_line - macd_signal AS macd_diff,
       |  CASE WHEN macd_line IS NULL OR macd_signal IS NULL THEN 'off'
       |       WHEN macd_line - macd_signal > 0.0 THEN 'normal'
       |       ELSE 'inverse' END AS macd_delta_color,
       |  close_t1, close_t2, close_t3, close_t4
       |FROM last ORDER BY symbol""".stripMargin
}
