package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CorpusIngest

/** The corpus-ingest stream: quality gate + watermarked content dedup
  * over MemoryStream micro-batches — re-sent near-identical documents
  * (same fingerprint: case/whitespace variants) are dropped across
  * batch boundaries, low-quality docs never enter state.
  */
class CorpusIngestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(3600L * 1000 + m * 60000L)

  // long enough (and stopword-laden) to clear quality 0.5
  private val good =
    "the quick brown fox jumps over the lazy dog and that is a tale " +
      "of the river in the valley that winds to the sea in the morning"

  test("quality gate + cross-batch fingerprint dedup") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val out = CorpusIngest.ingest(
      stream.toDF().toDF("doc_id", "text", "event_time"), minQuality = 0.5)
    val checkpoint = Files.createTempDirectory("graft-ingest-ckpt").toString
    val query = out.writeStream
      .format("memory").queryName("ingested")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .start()
    try {
      stream.addData((0L, good, ts(0)), (1L, "x!", ts(1)))
      query.processAllAvailable()
      // batch 2: same content as doc 0 modulo whitespace (same
      // fingerprint, still quality-passing) plus one genuinely new doc
      stream.addData((2L, good.replace(" ", "  "), ts(2)),
        (3L, good + " but this one ends differently in the hills", ts(3)))
      query.processAllAvailable()
      val got = spark.table("ingested").select("doc_id")
        .as[Long].collect().sorted.toSeq
      // doc 1 fails quality; doc 2 dedups against doc 0's fingerprint
      assert(got === Seq(0L, 3L))
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS ingested")
    }
  }

  private val good2 =
    "a different tale of the sea and the stars that is told in the " +
      "night when the wind comes down from the mountains to the shore"

  test("web front: canonicalize → deny gate → URL dedup → quality " +
      "gate → content dedup; streaming == batch on any chunking") {
    // one row per kill-stage, in crawl order
    val rows = Seq(
      (0L, "HTTP://Good.com/a?z=1&b=2", good, ts(0)),   // survives
      (1L, "http://good.com/a?b=2&z=1", good2, ts(1)),  // same CANONICAL url as 0 (param order) → URL dedup
      (2L, "http://spam.com/x", good, ts(2)),           // denied host
      (3L, "http://cdn.spam.com/y", good, ts(3)),       // denied subdomain
      (4L, "https://other.org/b", "x!", ts(4)),         // fails quality
      (5L, "https://other.org/c", good, ts(5)),         // same CONTENT as 0 → fp dedup
      (6L, "https://other.org/d?q=7", good2, ts(6)))    // survives
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusIngest.ingestWeb(df, denyExact = Nil,
        denySuffixes = Seq("spam.com"), minQuality = 0.5)

    val batch = run(rows.toDF("doc_id", "url", "text", "event_time"))
      .select("doc_id", "url_canon", "host")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(batch === Seq(
      (0L, "http://good.com/a?b=2&z=1", "good.com"),
      (6L, "https://other.org/d?q=7", "other.org")))

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String, Timestamp)]
    val checkpoint = Files.createTempDirectory("graft-web-ckpt").toString
    val query = run(stream.toDF().toDF("doc_id", "url", "text", "event_time"))
      .writeStream.format("memory").queryName("web_ingested")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .start()
    try {
      // uneven chunks: the URL-dup pair and the content-dup pair both
      // STRADDLE batch boundaries — the stateful stages must carry
      Seq(rows.take(1), rows.slice(1, 5), rows.drop(5)).foreach { c =>
        stream.addData(c); query.processAllAvailable()
      }
      val got = spark.table("web_ingested")
        .select("doc_id", "url_canon", "host")
        .as[(Long, String, String)].collect().sortBy(_._1).toSeq
      assert(got === batch, "streamed web front diverged from batch")
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS web_ingested")
    }
  }

  test("web front LATE DATA straddling the watermark (round-15 " +
      "sweep): in-horizon duplicates drop at both stages; a " +
      "behind-the-watermark row is discarded; an expired-state " +
      "duplicate re-emits — the bounded-state horizon contract") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String, Timestamp)]
    val checkpoint = Files.createTempDirectory("graft-late-ckpt").toString
    val query = CorpusIngest.ingestWeb(
        stream.toDF().toDF("doc_id", "url", "text", "event_time"),
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("web_late")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .start()
    def drained(): Seq[Long] = spark.table("web_late")
      .select("doc_id").as[Long].collect().sorted.toSeq
    try {
      // batch 1: the original — seeds BOTH dedup states
      stream.addData((0L, "http://a.org/p?x=1", good, ts(0)))
      query.processAllAvailable()
      // batch 2: in-horizon duplicates — a URL dup (same canonical
      // location) and a content dup (same fp, new location): both
      // must drop even though they straddled a batch boundary
      stream.addData((1L, "HTTP://A.org/p?x=1", good2, ts(5)),
        (2L, "http://b.org/q", good, ts(6)))
      query.processAllAvailable()
      assert(drained() === Seq(0L), "in-horizon duplicates must drop")
      // batch 3: advance the watermark far past doc 0's state expiry
      // (event_time 120 min − 10 min delay ⇒ watermark ≈ 110 min;
      // doc 0's keys expired at their event_time + delay = 10 min)
      stream.addData((3L, "http://c.org/r", good2, ts(120)))
      query.processAllAvailable()
      // batch 4a: a LATE duplicate — event_time (1 min) behind the
      // watermark (110 min). Spark's watermark filter discards
      // behind-the-watermark input rows before the stateful stages:
      // the row produces NO output (neither emitted nor re-seeding
      // state) — pin that it is absent, not re-emitted
      stream.addData((4L, "http://a.org/p?x=1", good, ts(1)))
      query.processAllAvailable()
      assert(!drained().contains(4L),
        "a behind-the-watermark row must be discarded, not re-emitted")
      // batch 4b: the SAME location + content with a FRESH event_time
      // after both states expired: re-emits. This is the documented
      // bounded-state trade — the dedup horizon IS the watermark;
      // state tracks unique keys within it, not forever
      stream.addData((5L, "http://a.org/p?x=1", good, ts(125)))
      query.processAllAvailable()
      assert(drained() === Seq(0L, 3L, 5L),
        "expired-state duplicate must re-emit (horizon contract)")
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS web_late")
    }
  }

  test("web front stage ORDER: URL dedup precedes the quality gate " +
      "(the C4 contract — cheapest kills first)") {
    // doc 20 (quality-failing) is the canonical-location survivor;
    // doc 21 (quality-passing) is the SAME location. URL dedup runs
    // BEFORE any text is read, so the location's survivor is doc 20,
    // which then fails quality — NEITHER emerges. A quality-first
    // order would have kept doc 21; this pin makes the stage order a
    // contract, not an accident.
    val rows = Seq(
      (20L, "http://a.org/p", "x!", ts(0)),
      (21L, "http://a.org/p", good, ts(1)))
    val out = CorpusIngest.ingestWeb(
      rows.toDF("doc_id", "url", "text", "event_time"))
    assert(out.count() === 0L)
  }

  test("batch mode: the same transform runs un-streamed") {
    val df = Seq((0L, good, ts(0)), (1L, good, ts(1)))
      .toDF("doc_id", "text", "event_time")
    val out = CorpusIngest.ingest(df).select("doc_id").as[Long]
      .collect().sorted.toSeq
    assert(out === Seq(0L)) // second copy dedups even in batch
  }
}
