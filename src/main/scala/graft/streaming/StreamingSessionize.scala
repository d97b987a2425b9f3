package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event entering the streaming sessionizer. */
case class SessEvent(user_id: Long, ts: Long)

/** One emitted sessionized event — the same (user, ts, session_seq)
  * surface as the batch `Sessionize.sessionize`, so the parity spec
  * compares rows verbatim.
  */
case class SessRow(user_id: Long, ts: Long, session_seq: Long)

/** Per-user sessionizer state: last seen timestamp + running session
  * ordinal — two longs per user, forever.
  */
case class SessState(lastTs: Long, seq: Long)

/** CONTINUOUS gap-timeout sessionization — the streaming twin of the
  * oracle-gated batch window form (q_sessionize): a session breaks
  * when the gap to the previous event of the SAME user exceeds
  * `gapUs`, and the ordinal carries across micro-batches with
  * `flatMapGroupsWithState` (the [[StatefulIndicators]] recipe). The
  * batch form needs the user's full history in one window pass; the
  * stream needs two longs of state per user.
  *
  * Ordering contract: events must arrive ts-ordered PER USER across
  * batches (within a batch they are sorted here) — same contract as
  * [[StreamingCusum]]. Session MERGING on out-of-order arrival is
  * deliberately out of scope: an event bridging two already-emitted
  * sessions would have to retract rows, which Append mode cannot do.
  * A violation is DETECTABLE, not silent: an event older than the
  * user's last emitted timestamp fails the task with a contract
  * error (StreamingSessionizeSpec pins it) — wrong ordinals would
  * otherwise propagate downstream unnoticed. Producers with genuine
  * reordering should bound it upstream (watermark + sort within the
  * bound) before this operator.
  *
  * Scale: one shuffle on user for the keyed state; emission is
  * append-pure (each row final when emitted).
  */
object StreamingSessionize {

  implicit val evEnc: Encoder[SessEvent] = Encoders.product[SessEvent]
  implicit val rowEnc: Encoder[SessRow] = Encoders.product[SessRow]
  implicit val stEnc: Encoder[SessState] = Encoders.product[SessState]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Narrow a (streaming or batch) frame with (user_id, ts) columns. */
  def events(df: DataFrame): Dataset[SessEvent] =
    df.select(col("user_id").cast("long"), col("ts").cast("long"))
      .as[SessEvent]

  private def processGroup(gapUs: Long)(user: Long,
      rows: Iterator[SessEvent],
      state: GroupState[SessState]): Iterator[SessRow] = {
    var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L))
    val out = rows.toSeq.sortBy(_.ts).map { e =>
      // fail fast on a cross-batch ordering violation: an event older
      // than the last emitted one would silently assign wrong
      // ordinals (and could never merge sessions in Append mode)
      if (st.seq > 0L && e.ts < st.lastTs)
        throw new IllegalStateException(
          s"out-of-order event for user $user: ts=${e.ts} < " +
            s"last=${st.lastTs} — StreamingSessionize requires " +
            "per-user ts-ordered arrival across micro-batches")
      val seq = if (st.seq == 0L || e.ts - st.lastTs > gapUs) st.seq + 1L
        else st.seq
      st = SessState(e.ts, seq)
      SessRow(user, e.ts, seq)
    }
    state.update(st)
    out.iterator
  }

  /** Apply the sessionizer to a (streaming or batch) event stream. */
  def sessions(ev: Dataset[SessEvent], gapUs: Long): Dataset[SessRow] = {
    require(gapUs > 0L, "gapUs must be positive")
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(processGroup(gapUs) _)
  }
}
