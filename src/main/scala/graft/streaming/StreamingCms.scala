package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Sketch, TermStats}

/** One sketch-counter update key: sketch row × cell. */
case class CmsKey(r: Int, cell: Long)

/** An emitted counter value after a micro-batch touched its cell. */
case class CmsCounter(r: Int, cell: Long, c: Long)

/** CONTINUOUS count–min sketch maintenance — the streaming twin of the
  * oracle-gated batch sketch ([[graft.operators.Sketch.cmsHeavyHitters]]
  * / q_cms_topk): per-(row, cell) counters carried across micro-batches
  * with `flatMapGroupsWithState`, using the SAME md5-prefix cell hash
  * ([[Sketch.cmsCell]]) so stream and batch counters are comparable
  * cell-for-cell. A monitoring consumer reads the counter table and
  * answers "estimated frequency of term t right now" with d lookups —
  * the point of a sketch: O(d·w) state for an unbounded vocabulary,
  * where exact streaming term counts would need O(|vocab|) keyed state.
  *
  * Exactness: counters are sums of integer occurrence counts —
  * order-free arithmetic — so after draining any chunking of a corpus
  * the final counters are bit-identical to the batch sketch's counter
  * relation on the same data (StreamingCmsSpec pins this).
  *
  * Scale: the per-batch explode is map-side; the one shuffle keys on
  * (r, cell) — at most d·w live groups regardless of corpus size, so
  * the state store is bounded by construction. Update-mode emission:
  * only cells touched by a batch re-emit.
  */
object StreamingCms {

  implicit val keyEnc: Encoder[CmsKey] = Encoders.product[CmsKey]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong
  implicit val ctrEnc: Encoder[CmsCounter] = Encoders.product[CmsCounter]
  implicit val incEnc: Encoder[(Int, Long, Long)] =
    Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong,
      Encoders.scalaLong)

  /** Per-row (term-occurrence × sketch-row) increment rows for a
    * (streaming or batch) document frame — one row per token per
    * sketch row, carrying weight 1. No pre-aggregation: keyed-state
    * ops can't follow a streaming aggregate, so the reduction happens
    * inside [[counters]]' group iterator instead (the map-side combine
    * equivalent lives in the state update).
    */
  def increments(docs: DataFrame, text: Column, d: Int,
      w: Int): Dataset[(Int, Long, Long)] = {
    require(d >= 1 && w >= 1, "d and w must be >= 1")
    docs.filter(text.isNotNull)
      .select(explode(TermStats.cleanWords(text)).as("term"))
      .select(col("term"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("r").cast("int"),
        Sketch.cmsCell(col("r"), col("term"), w), lit(1L))
      .as[(Int, Long, Long)]
  }

  private def updateGroup(key: CmsKey, rows: Iterator[(Int, Long, Long)],
      state: GroupState[Long]): Iterator[CmsCounter] = {
    var c = state.getOption.getOrElse(0L)
    rows.foreach(c += _._3)
    state.update(c)
    Iterator(CmsCounter(key.r, key.cell, c))
  }

  /** The live counter relation: one updated (r, cell, c) row per cell
    * touched by each micro-batch. The latest row per (r, cell) IS the
    * sketch; counters only grow, so a sink may also keep the max.
    */
  def counters(incs: Dataset[(Int, Long, Long)]): Dataset[CmsCounter] =
    incs.groupByKey(t => CmsKey(t._1, t._2))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateGroup _)
}
