package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextStats

/** The LLM-corpus ingest pipeline as a STREAMING transform: the same
  * narrow text operators the batch queries gate (stats → quality
  * score → fingerprint) run unchanged inside a micro-batch plan, and
  * content dedup becomes the watermarked stateful
  * `dropDuplicatesWithinWatermark` on the fingerprint — re-crawled
  * near-identical documents inside the horizon are dropped with state
  * bounded by the watermark, so the ingest runs forever at any rate.
  *
  * Shape notes (100 TB / continuous): everything before the dedup is
  * a stateless projection (scales with input partitions, zero state);
  * the dedup state is one fingerprint per surviving doc within the
  * horizon — the content-addressed key means state size tracks UNIQUE
  * content, not crawl volume.
  */
object CorpusIngest {

  /** quality-gate → fingerprint → content dedup.
    * Input: `doc_id: long, text: string, event_time: timestamp`.
    * Output adds `quality` and `fp`; emits only first-seen-per-
    * fingerprint docs with quality ≥ `minQuality`.
    *
    * Streaming input dedups with watermark-bounded state; batch input
    * (the same transform is source-agnostic) takes the deterministic
    * min-doc_id survivor instead — `dropDuplicates` alone would keep a
    * partitioning-dependent row.
    */
  def ingest(docs: DataFrame, minQuality: Double = 0.5,
      watermark: String = "24 hours"): DataFrame = {
    val gated = TextStats.addStats(docs, col("text"))
      .withColumn("quality", TextStats.qualityScore)
      .filter(col("quality") >= minQuality)
      .withColumn("fp", TextStats.fingerprint(col("text")))
      .select("doc_id", "text", "event_time", "quality", "fp")
    if (docs.isStreaming)
      gated.withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark("fp")
    else
      graft.operators.Dedup.exactDedup(gated, col("fp"), col("doc_id"))
  }
}
