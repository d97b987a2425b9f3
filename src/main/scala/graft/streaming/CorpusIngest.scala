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

  /** The WEB-corpus ingest front (round-13 verdict #6): the reference's
    * ingest-is-a-stream architecture applied to the URL operator
    * family — canonicalize → host deny gate → URL-location dedup →
    * quality gate → content dedup, the C4/CCNet stage ORDER (URL-level
    * kills are cheapest, so they run before any text is touched).
    * Input: `doc_id: long, url: string, text: string,
    * event_time: timestamp`; output keeps `text` (the pipeline's
    * PRODUCT — survivors feed training downstream) and adds
    * `url_canon, host, quality, fp`.
    *
    * Streaming input runs BOTH dedups as watermark-bounded stateful
    * stages (two chained dropDuplicatesWithinWatermark — Spark's
    * multi-stateful append pipeline); batch input takes the
    * deterministic min-doc_id survivor at each stage. CorpusIngestSpec
    * pins the two equal on any chunking of an in-order feed. Every
    * stage before the first dedup is a stateless codegen projection
    * (the canonicalizer is built-in string fns end to end), so the
    * front scales with input partitions; dedup state tracks unique
    * LOCATIONS and unique CONTENT within the horizon, not crawl
    * volume.
    */
  def ingestWeb(docs: DataFrame, denyExact: Seq[String] = Nil,
      denySuffixes: Seq[String] = Nil, minQuality: Double = 0.5,
      watermark: String = "24 hours"): DataFrame = {
    import graft.functions.UrlOps
    val canon = docs
      .withColumn("url_canon", UrlOps.canonicalizeUrl(col("url")))
      .withColumn("host", UrlOps.hostOf(col("url")))
      .filter(!UrlOps.isBlockedHost(col("host"), denyExact, denySuffixes))
    if (docs.isStreaming) {
      val urlDeduped = canon.withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark("url_canon")
      val gated = TextStats.addStats(urlDeduped, col("text"))
        .withColumn("quality", TextStats.qualityScore)
        .filter(col("quality") >= minQuality)
        .withColumn("fp", TextStats.fingerprint(col("text")))
        .select("doc_id", "url_canon", "host", "text", "event_time",
          "quality", "fp")
      gated.dropDuplicatesWithinWatermark("fp")
    } else {
      val urlDeduped = graft.operators.Dedup.exactDedup(
        canon, col("url_canon"), col("doc_id"))
      val gated = TextStats.addStats(urlDeduped, col("text"))
        .withColumn("quality", TextStats.qualityScore)
        .filter(col("quality") >= minQuality)
        .withColumn("fp", TextStats.fingerprint(col("text")))
        .select("doc_id", "url_canon", "host", "text", "event_time",
          "quality", "fp")
      graft.operators.Dedup.exactDedup(gated, col("fp"), col("doc_id"))
    }
  }
}
