package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An emitted HLL register after a micro-batch touched its bucket. */
case class HllRegister(bucket: Long, max_rho: Long)

/** CONTINUOUS HyperLogLog maintenance — the streaming twin of the
  * oracle-gated batch registers ([[graft.operators.CardSketch]] /
  * q_hll_ngrams): per-bucket max(rho) carried across micro-batches
  * with `flatMapGroupsWithState`, using the SAME md5-prefix hash
  * split, so drained-stream registers are bit-identical to the batch
  * sketch on any chunking (max is order-free and
  * duplicate-absorbing). A monitoring consumer reads ≤ 2^mBits rows
  * and has the live distinct-count estimate of an unbounded stream —
  * where exact streaming distinct needs O(|distinct|) keyed state.
  *
  * Scale: the one shuffle keys on bucket — ≤ 2^mBits live groups
  * forever; each state value is one long. Update-mode emission: only
  * buckets touched by a batch re-emit, and only when their register
  * actually GREW (an unchanged max is not re-emitted — the natural
  * HLL property that late duplicates are free).
  */
object StreamingHll {

  implicit val regEnc: Encoder[HllRegister] = Encoders.product[HllRegister]
  implicit val obsEnc: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  implicit val obs3Enc: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong)
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** (bucket, rho) observation rows for a (streaming or batch) item
    * frame — [[graft.operators.CardSketch.withHllParts]] IS the hash
    * split (one shared definition, so stream and batch registers are
    * mergeable by construction).
    */
  def observations(df: DataFrame, item: Column,
      mBits: Int): Dataset[(Long, Long)] =
    graft.operators.CardSketch
      .withHllParts(df.select(item.as("_item")), col("_item"), mBits)
      .select(col("bucket"), col("rho"))
      .as[(Long, Long)]

  private def updateGroup(bucket: Long, rows: Iterator[(Long, Long)],
      state: GroupState[Long]): Iterator[HllRegister] = {
    val prev = state.getOption.getOrElse(0L)
    var m = prev
    rows.foreach(r => if (r._2 > m) m = r._2)
    if (m > prev) {
      state.update(m)
      Iterator(HllRegister(bucket, m))
    } else Iterator.empty
  }

  /** The live register relation: one (bucket, max_rho) row per bucket
    * whose register GREW in a micro-batch. The latest row per bucket
    * IS the sketch (registers only grow).
    */
  def registers(obs: Dataset[(Long, Long)]): Dataset[HllRegister] =
    obs.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateGroup _)

  /** GROUPED continuous HLL — one sketch per group key (the rolling-
    * WAU deployment: group = window day, item = user). State is
    * (group, bucket) → one long, so live state is ≤ groups × 2^mBits
    * exact integers REGARDLESS of user cardinality — the principled
    * bounded-state answer to "distinct users per sliding window" on
    * an unbounded stream, where the exact operator's state grows with
    * users × windows. Same register semantics as [[registers]]
    * (grow-only max, update-mode emission only on growth), so drained
    * registers are bit-identical to the batch
    * [[graft.operators.CardSketch.hllRegistersBy]] on any chunking;
    * the batch analogue with the same hash split is oracle-gated as
    * q_hll_wau. Groups that stop arriving keep ≤ m longs each —
    * retire closed windows with a timeout policy if group count is
    * itself unbounded.
    */
  def groupedObservations(df: DataFrame, group: Column, item: Column,
      mBits: Int): Dataset[(Long, Long, Long)] =
    graft.operators.CardSketch
      .withHllParts(df.select(group.as("_grp"), item.as("_item")),
        col("_item"), mBits)
      .select(col("_grp"), col("bucket"), col("rho"))
      .as[(Long, Long, Long)]

  private def updateGrouped(key: (Long, Long),
      rows: Iterator[(Long, Long, Long)],
      state: GroupState[Long]): Iterator[(Long, Long, Long)] = {
    val prev = state.getOption.getOrElse(0L)
    var m = prev
    rows.foreach(r => if (r._3 > m) m = r._3)
    if (m > prev) {
      state.update(m)
      Iterator((key._1, key._2, m))
    } else Iterator.empty
  }

  /** Live (group, bucket, max_rho) register relation for
    * [[groupedObservations]]; latest row per (group, bucket) is the
    * group's sketch.
    */
  def groupedRegisters(
      obs: Dataset[(Long, Long, Long)]): Dataset[(Long, Long, Long)] =
    obs.groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateGrouped _)
}
