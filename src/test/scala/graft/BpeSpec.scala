package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE training pinned against a sequential reference trainer: the
  * classic per-word greedy left-to-right merge loop, including the
  * overlapping-chain ("aaa") parity case the relational run-parity
  * rule must reproduce.
  */
class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Split a word into CODE POINTS, not UTF-16 code units — the
    * engine's `substr(i, 1)` and the DuckDB oracle both index code
    * points, so a sequential model that maps over Java chars would
    * silently split astral-plane characters (surrogate pairs) in two
    * and diverge on any emoji/math-alphanumeric corpus.
    */
  private def cps(w: String): Vector[String] =
    w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toVector

  /** Sequential reference: count adjacent pairs (overlaps counted),
    * argmax by (freq desc, left, right), greedy left-to-right apply.
    */
  private def refTrain(texts: Seq[String],
      rounds: Int): Seq[(Long, String, String, String, Long)] = {
    var words: Seq[Vector[String]] = texts
      .flatMap(_.toLowerCase.split("[ \t\n\r\f]+").filter(_.nonEmpty))
      .map(cps)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      words.foreach { w =>
        w.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + 1L
        }
      }
      if (counts.isEmpty || counts.values.max < 2L) done = true
      else {
        val ((l, rr), f) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r.toLong, l, rr, l + rr, f))
        words = words.map { w =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < w.length) {
            if (i + 1 < w.length && w(i) == l && w(i + 1) == rr) {
              b += (l + rr); i += 2
            } else { b += w(i); i += 1 }
          }
          b.result()
        }
        r += 1
      }
    }
    out.toSeq
  }

  private def got(texts: Seq[String], rounds: Int) =
    Bpe.train(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"), rounds)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("train matches the sequential trainer on mixed text") {
    val texts = Seq("the cat sat on the mat", "the rat ate the cheese",
      "that hat is flat", "banana bandana", "low lower lowest newest")
    assert(got(texts, 4) === refTrain(texts, 4))
  }

  test("overlapping chains merge at even offsets (the aaa case)") {
    // "aaa" -> (aa) a, "aaaa" -> (aa)(aa): pair (a,a) has freq
    // 2+3=5 overlapping occurrences, then parity applies
    val texts = Seq("aaa aaaa", "aaa aaaa")
    val r = got(texts, 2)
    assert(r === refTrain(texts, 2))
    assert(r.head._2 === "a" && r.head._3 === "a" &&
      r.head._5 === 10L)
    // after merging: words are [aa, a] and [aa, aa] -> next best is
    // (aa, aa) freq 2 or (aa, a) freq 2 -> tie-break (aa,a) < (aa,aa)
    assert(r(1)._2 === "aa" && r(1)._3 === "a")
  }

  test("round-17 CodePoints kernel == the substr HOF split, astral " +
      "chars stay whole") {
    import org.apache.spark.sql.graft.Bridge
    def split(texts: Seq[String]) = texts.toDF("w")
      .select(Bridge.column(
        graft.functions.CodePoints(Bridge.expression(col("w")))).as("c"))
      .as[Seq[String]].collect().toSeq
    val texts = Seq("héllo wörld", "aaa", "x", "𝕏𝕐 a𝄞b", "日本語 mix3d_")
    val hof = texts.toDF("w")
      .select(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("c"))
      .as[Seq[String]].collect().toSeq
    assert(split(texts) === hof)
    assert(split(texts)(3) === Seq("𝕏", "𝕐", " ", "a", "𝄞", "b"))
    // empty word → empty array (the HOF form's sequence(1,0) DESCENDS
    // and yields ["",""] — a latent quirk both charSymbols and
    // encodePacked mask by filtering empty words before the split;
    // the kernel does the sane thing)
    assert(split(Seq("")) === Seq(Seq.empty[String]))
  }

  test("round-17 kernel encode == window-form encode, per (doc, " +
      "word, position) — chains included") {
    val texts = Seq("aaa aaaa aaaaa banana", "abab ababab xyxyx",
      "the cat sat on the mat", "low lower lowest newest")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.trainedMerges(df, col("doc_id"), col("text"), 4)
    def tokens(out: org.apache.spark.sql.DataFrame) =
      out.select("doc_id", "widx", "pos", "tok").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .groupBy(t => (t._1, t._2))
        .map { case (k, v) => k -> v.sortBy(_._3).map(_._4).toSeq }
        .toSeq.sortBy(_._1)
    val kernel = tokens(Bpe.encode(df, col("doc_id"), col("text"), merges))
    val windowed = tokens(
      Bpe.encodeWindowed(df, col("doc_id"), col("text"), merges))
    assert(kernel === windowed && kernel.nonEmpty)
  }

  test("merges never cross word boundaries; stops early when no " +
      "pair repeats") {
    // "ab" appears twice but only across different words of "a b"?
    // no — each word is a single char, so no pairs exist at all
    assert(got(Seq("a b", "a b"), 3) === Seq.empty)
    // one repeated two-char word -> exactly one merge then stop
    val r = got(Seq("xy xy", "xy"), 3)
    assert(r === Seq((1L, "x", "y", "xy", 3L)))
  }

  /** Sequential reference ENCODER: greedy left-to-right apply of a
    * trained merge list, per word, in rank order.
    */
  private def refEncode(texts: Seq[String],
      merges: Seq[(String, String)]): Map[String, Long] = {
    var words: Seq[Vector[String]] = texts
      .flatMap(_.toLowerCase.split("[ \t\n\r\f]+").filter(_.nonEmpty))
      .map(cps)
    merges.foreach { case (l, r) =>
      words = words.map { w =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < w.length) {
          if (i + 1 < w.length && w(i) == l && w(i + 1) == r) {
            b += (l + r); i += 2
          } else { b += w(i); i += 1 }
        }
        b.result()
      }
    }
    words.flatten.groupBy(identity).map { case (t, xs) =>
      (t, xs.size.toLong) }
  }

  test("encode with trained merges matches the sequential encoder " +
      "(token multiset)") {
    val texts = Seq("the cat sat on the mat", "the rat ate the cheese",
      "aaa aaaa banana bandana", "low lower lowest newest")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.trainedMerges(df, col("doc_id"), col("text"), 4)
    assert(merges === refTrain(texts, 4).map(t => (t._2, t._3)))
    val got = Bpe.encode(df, col("doc_id"), col("text"), merges)
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === refEncode(texts, merges))
  }

  test("persisted artifact: saved table IS the train relation; " +
      "encodeFromArtifact == inline-train encode row for row " +
      "(round-15 verdict Next #2)") {
    val texts = Seq("the cat sat on the mat", "the rat ate the cheese",
      "aaa aaaa banana bandana", "low lower lowest newest")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    try {
      Bpe.buildArtifact(docs, col("doc_id"), col("text"), rounds = 4,
        table = "graft_bpe_art",
        path = java.nio.file.Files
          .createTempDirectory("graft-bpe-art").toString)
      val saved = spark.table("graft_bpe_art").orderBy("round")
        .as[(Long, String, String, String, Long)].collect().toSeq
      val trained = Bpe.train(docs, col("doc_id"), col("text"), 4)
        .orderBy("round").as[(Long, String, String, String, Long)]
        .collect().toSeq
      assert(saved === trained && saved.nonEmpty,
        "the artifact table must be the train output verbatim")
      val viaArtifact = Bpe.encodeFromArtifact(spark, "graft_bpe_art",
          docs, col("doc_id"), col("text"))
        .orderBy("doc_id", "widx", "pos")
        .as[(Long, Int, Int, String)].collect().toSeq
      val inline = Bpe.encode(docs, col("doc_id"), col("text"),
          Bpe.trainedMerges(docs, col("doc_id"), col("text"), 4))
        .orderBy("doc_id", "widx", "pos")
        .as[(Long, Int, Int, String)].collect().toSeq
      assert(viaArtifact === inline && viaArtifact.nonEmpty,
        "artifact-encode must equal inline-train encode")
    } finally spark.sql("DROP TABLE IF EXISTS graft_bpe_art")
  }

  test("encodePacked == window-form encode == sequential, per " +
      "(doc, word, position)") {
    // includes the l == r chain cases where the run-parity rule and
    // the fold must agree occurrence-for-occurrence
    val texts = Seq("the cat sat on the mat", "aaa aaaa aaaaa banana",
      "abab ababab xyxyx", "low lower lowest newest")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.trainedMerges(df, col("doc_id"), col("text"), 4)
    def tokens(out: org.apache.spark.sql.DataFrame): Seq[((Long, Int), Seq[String])] =
      out.select("doc_id", "widx", "pos", "tok").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .groupBy(t => (t._1, t._2))
        .map { case (k, v) => k -> v.sortBy(_._3).map(_._4).toSeq }
        .toSeq.sortBy(_._1)
    val packed = tokens(
      Bpe.encodePacked(df, col("doc_id"), col("text"), merges))
    val window = tokens(
      Bpe.encodeWindowed(df, col("doc_id"), col("text"), merges))
    assert(packed === window)
    assert(tokens(Bpe.encode(df, col("doc_id"), col("text"), merges))
      === window) // round-17 kernel form agrees too
    val flat = packed.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    assert(flat === refEncode(texts, merges))
  }

  test("round-12: multi-byte code points — astral chains obey " +
      "run-parity and never split into surrogates") {
    // 𝕒 (U+1D552) is an astral-plane char: one code point, TWO Java
    // chars. The engine's substr/length are code-point based; a chain
    // of identical astral chars exercises run-parity on top of that.
    // 日本語 adds 3-byte BMP points; ñ a 2-byte one. None have case
    // mappings that differ between JVM and engine lowercasing.
    val a4 = "𝕒𝕒𝕒𝕒" // 𝕒𝕒𝕒𝕒
    val a3 = a4.substring(0, 6) // 𝕒𝕒𝕒
    val texts = Seq(s"$a4 $a3 日本語 日本語", s"$a4 ñaña ñaña 日本")
    val r = got(texts, 3)
    assert(r === refTrain(texts, 3))
    // the astral pair is the most frequent: freqs 3+2 (overlap) +3+2
    assert(r.head._2 === "𝕒" && r.head._3 === "𝕒",
      s"first merge must be the astral pair, got $r")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.trainedMerges(df, col("doc_id"), col("text"), 3)
    val enc = Bpe.encode(df, col("doc_id"), col("text"), merges)
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(enc === refEncode(texts, merges))
    // no token ever contains an unpaired surrogate half (a code point
    // in U+D800–U+DFFF means a split astral char)
    assert(enc.keys.forall(t => t.codePoints().toArray
      .forall(cp => cp < 0xD800 || cp > 0xDFFF)))
  }

  test("train is invariant under partitioning") {
    val texts = (0 until 200).map(i =>
      s"w${i % 7} common tokens appear${i % 3} here")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = Bpe.train(df.repartition(1), col("doc_id"), col("text"), 3)
      .orderBy("round").collect().toSeq
    val b = Bpe.train(df.repartition(13), col("doc_id"), col("text"), 3)
      .orderBy("round").collect().toSeq
    assert(a === b)
  }
}
