package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One tick entering the streaming CUSUM chart: `target` is the
  * symbol's reference level (joined on before grouping — see
  * [[StreamingCusum.withTargets]]).
  */
case class CusumBar(symbol: String, ts: Long, close: Double,
    target: Double)

/** One emitted chart row — the same columns as the batch
  * `Finance.cusumChart` so the parity spec compares rows verbatim.
  */
case class CusumRow(symbol: String, ts: Long, close: Double,
    target: Double, cusum_pos: Double, cusum_neg: Double, alarm: Boolean)

/** Per-symbol CUSUM accumulators — the entire keyed state (two
  * doubles + the last-seen timestamp), O(1) per symbol forever.
  *
  * STATE-SCHEMA COMPATIBILITY: `lastTs` was added after the initial
  * release (round 12). flatMapGroupsWithState serializes this case
  * class into the checkpoint, so a query restarted from a checkpoint
  * written by the two-field (cp, cn) schema will fail to decode its
  * state — upgrading across this change requires a FRESH checkpoint
  * directory (or an offline state rewrite). Any future field change
  * here carries the same cost; prefer appending a versioned wrapper
  * if in-place upgrades ever matter.
  */
case class CusumChartState(cp: Double, cn: Double, lastTs: Long)

/** CONTINUOUS two-sided CUSUM drift detection (Page 1954) over a
  * stream: the same clamped recursion as the batch
  * [[graft.operators.Finance.cusumChart]] / [[graft.functions.Cusum]]
  * window function, carried across micro-batches with
  * `flatMapGroupsWithState` — the [[StatefulIndicators]] recipe. A
  * monitoring consumer gets an alarm row the moment either chart
  * crosses `h`, regardless of how the feed was chunked into triggers.
  *
  * The one semantic difference from batch: a stream cannot know the
  * series' own full-history mean, so the reference level is an INPUT
  * — per-symbol targets computed upstream (e.g. from yesterday's
  * batch mean, the standard CUSUM deployment: Page's scheme assumes a
  * known in-control level). Feeding the batch pipeline's own
  * fixed-point mean reproduces q_cusum bar-for-bar; `StreamingSpec`
  * pins that parity across multi-batch splits.
  *
  * FP contract: update is `max(0.0, s + d)` in IEEE doubles with the
  * same operand order as the window function's
  * `greatest(0.0, s + d)`, and the s₀ = 0 seed is exact (0.0 + d ≡ d
  * for every non-NaN d), so stream and batch rows are bit-identical.
  *
  * Scale: one shuffle on symbol for the keyed state; the target join
  * below is broadcast (symbol directory ≪ tick volume). State is two
  * doubles per symbol.
  */
object StreamingCusum {

  implicit val barEnc: Encoder[CusumBar] = Encoders.product[CusumBar]
  implicit val rowEnc: Encoder[CusumRow] = Encoders.product[CusumRow]
  implicit val stEnc: Encoder[CusumChartState] =
    Encoders.product[CusumChartState]
  implicit val strEnc: Encoder[String] = Encoders.STRING

  /** Attach per-symbol targets to a (streaming or batch) tick frame
    * via a stream-static broadcast join. `targets` must have columns
    * (symbol, target).
    */
  def withTargets(bars: DataFrame, targets: DataFrame): Dataset[CusumBar] =
    bars.join(broadcast(targets), "symbol")
      .select(col("symbol"), col("ts").cast("long"),
        col("close").cast("double"), col("target").cast("double"))
      .as[CusumBar]

  private def processGroup(h: Double)(symbol: String,
      rows: Iterator[CusumBar],
      state: GroupState[CusumChartState]): Iterator[CusumRow] = {
    var st = state.getOption
      .getOrElse(CusumChartState(0.0, 0.0, Long.MinValue))
    val out = rows.toSeq.sortBy(_.ts).map { b =>
      // fail fast on a cross-batch ordering violation — a reordered
      // bar would silently corrupt both recursions (same detectable
      // contract as StreamingSessionize)
      if (b.ts < st.lastTs)
        throw new IllegalStateException(
          s"out-of-order bar for symbol $symbol: ts=${b.ts} < " +
            s"last=${st.lastTs} — StreamingCusum requires per-symbol " +
            "ts-ordered arrival across micro-batches")
      val cp = math.max(0.0, st.cp + (b.close - b.target))
      val cn = math.max(0.0, st.cn + (b.target - b.close))
      st = CusumChartState(cp, cn, b.ts)
      CusumRow(b.symbol, b.ts, b.close, b.target, cp, cn,
        cp > h || cn > h)
    }
    state.update(st)
    out.iterator
  }

  /** Apply the two-sided chart to a (streaming or batch)
    * Dataset[CusumBar]. Append mode: each row is final once emitted.
    * Bars must arrive in ts order per symbol ACROSS batches (within a
    * batch they are sorted here) — same contract as
    * [[StatefulIndicators.enrich]]. A violation fails the task with a
    * contract error (detectable, never silently-wrong recursions).
    */
  def chart(bars: Dataset[CusumBar], h: Double): Dataset[CusumRow] =
    bars.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(processGroup(h) _)

  /** Just the alarm transitions — the rows a monitoring sink actually
    * wants: the FIRST row of each alarm episode per symbol would need
    * previous-row state; emitting every `alarm = true` row keeps the
    * operator append-pure and lets the sink dedup episodes.
    */
  def alarms(bars: Dataset[CusumBar], h: Double): Dataset[CusumRow] =
    chart(bars, h).filter(_.alarm)
}
