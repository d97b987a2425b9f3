package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Sampling

/** One pruned observation entering the streaming sampler. */
case class PrioObs(id: Long, w: Long, priority: Double)

/** The sampler's whole state: batch ordinal + the current top-(k+1)
  * entries (parallel arrays — k+1 rows however long the stream runs).
  */
case class PrioState(seq: Long, ids: Array[Long], ws: Array[Long],
    prios: Array[Double])

/** One emitted sample row; rows of the latest `seq` ARE the sample. */
case class PrioRow(seq: Long, id: Long, w: Long, priority: Double,
    w_hat: Double)

/** CONTINUOUS weighted priority sampling (Duffield, Lund & Thorup,
  * JACM 2007) — the streaming twin of the oracle-gated batch sampler
  * ([[Sampling.prioritySample]] / q_priority_sample): keep the k
  * highest-priority rows of an unbounded stream, where
  * priority = w·10⁹/u with u a DETERMINISTIC per-id hash. Because the
  * priorities are hash-derived (not drawn), the streaming sample after
  * draining ANY chunking is BIT-IDENTICAL to the batch sampler on the
  * same rows — including the tau threshold and the w_hat = max(w, tau)
  * Horvitz-Thompson weight estimates (StreamingPrioritySampleSpec pins
  * it).
  *
  * Scale shape: the unbounded work is map-side — [[observations]]
  * prunes each input partition to its local top-(k+1) with a bounded
  * buffer (4·(k+1) entries), so the single merge group receives at
  * most partitions·(k+1) rows per micro-batch, and the keyed state
  * holds exactly k+1 entries forever. This is the standard
  * distributed-top-k split: the one-group shuffle is metadata-sized,
  * never the stream. Exact streaming "uniform-ish sample of
  * everything seen so far" state is otherwise unbounded — the sketch
  * trade the twin family exists for.
  *
  * INPUT CONTRACT (same as the batch sampler's): `id` is a unique row
  * key — each id carries ONE immutable weight. A re-offered id (a
  * replay) must repeat the same (w, priority); the state merge then
  * keeps one occurrence (`distinctBy(_.id)`) so a replayed row cannot
  * occupy two sample slots. If the SAME id ever arrives with a
  * DIFFERENT weight, this sampler keeps only the higher-priority
  * occurrence while the batch sampler would rank both rows — the
  * advertised bit-parity holds only under the unique-id contract.
  */
object StreamingPrioritySample {

  implicit val obsEnc: Encoder[PrioObs] = Encoders.product[PrioObs]
  implicit val stEnc: Encoder[PrioState] = Encoders.product[PrioState]
  implicit val rowEnc: Encoder[PrioRow] = Encoders.product[PrioRow]
  implicit val intEnc: Encoder[Int] = Encoders.scalaInt

  private def better(a: PrioObs, b: PrioObs): Boolean =
    a.priority > b.priority || (a.priority == b.priority && a.id < b.id)

  /** Prune an iterator to its top-`n` by (priority desc, id asc) with
    * a bounded buffer: accumulate to 4n, sort + trim, repeat — O(n)
    * memory regardless of partition size.
    */
  private[graft] def localTop(it: Iterator[PrioObs],
      n: Int): Iterator[PrioObs] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[PrioObs]
    def trim(): Unit = if (buf.length > n) {
      val kept = buf.sortWith(better).take(n)
      buf.clear(); buf ++= kept
    }
    it.foreach { e => buf += e; if (buf.length >= 4 * n) trim() }
    trim()
    buf.iterator
  }

  /** Map-side-pruned (id, w, priority) observations for a (streaming
    * or batch) frame — the SAME deterministic priority formula as the
    * batch sampler, evaluated codegen'd before the prune.
    */
  def observations(df: DataFrame, id: Column, weight: Column,
      k: Int): Dataset[PrioObs] = {
    require(k >= 1, "k must be >= 1")
    df.select(id.cast("long").as("id"), weight.cast("long").as("w"))
      .filter(col("w").isNotNull && col("w") > 0L)
      .withColumn("priority", col("w").cast("double") * lit(1.0e9) /
        (Sampling.hashBucket(col("id"), 1000000000) + lit(1L))
          .cast("double"))
      .as[PrioObs]
      .mapPartitions(it => localTop(it, k + 1))
  }

  private def updateGroup(k: Int)(key: Int, rows: Iterator[PrioObs],
      state: GroupState[PrioState]): Iterator[PrioRow] = {
    val prev = state.getOption
      .map(s => s.ids.indices.map(i => PrioObs(s.ids(i), s.ws(i),
        s.prios(i))))
      .getOrElse(Seq.empty)
    val seq = state.getOption.map(_.seq).getOrElse(0L) + 1L
    // re-offered ids (replays) carry identical (w, priority) — keep
    // one occurrence so a duplicate can't occupy two sample slots
    val all = (prev ++ rows).sortWith(better)
      .distinctBy(_.id).take(k + 1).toArray
    state.update(PrioState(seq, all.map(_.id), all.map(_.w),
      all.map(_.priority)))
    val tau = if (all.length == k + 1) all.last.priority else 0.0
    all.take(k).iterator.map(e =>
      PrioRow(seq, e.id, e.w, e.priority, math.max(e.w.toDouble, tau)))
  }

  /** The live sample: each micro-batch re-emits the current top-k as
    * rows tagged with the batch ordinal `seq`; the rows of the LATEST
    * seq are the sample (and bit-match the batch sampler on the same
    * drained rows).
    */
  def sample(obs: Dataset[PrioObs], k: Int): Dataset[PrioRow] = {
    require(k >= 1, "k must be >= 1")
    obs.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateGroup(k) _)
  }
}
