package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextStats}

/** Goldens for the dedup + text-analysis operators on synthetic docs
  * with known duplicate structure.
  */
class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 10
  private val docs = Seq(
    (0L, base.trim),
    (1L, base.trim),                                   // exact duplicate of 0
    // near-dup of 0/1: the repeated base has 9 distinct cyclic 3-gram
    // shingles; one appended word adds exactly one → jaccard 9/10 = 0.9
    (2L, (base + "extra").trim),
    (3L, "completely different content about spark window functions and shuffles"),
    (4L, ("spark " * 50).trim),                        // pathological repetition
  ).toDF("doc_id", "text")

  test("exactDedup keeps the smallest id per fingerprint") {
    val kept = Dedup.exactDedup(
        docs.withColumn("fp", TextStats.fingerprint(col("text"))),
        col("fp"), col("doc_id"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(0L, 2L, 3L, 4L)) // 1 dropped as dup of 0
  }

  test("exactDedup is case/whitespace-normalizing via the fingerprint") {
    val df = Seq((0L, "Hello  World"), (1L, "hello world"), (2L, "other"))
      .toDF("doc_id", "text")
    val kept = Dedup.exactDedup(
        df.withColumn("fp", TextStats.fingerprint(col("text"))),
        col("fp"), col("doc_id"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(0L, 2L))
  }

  test("shingles: distinct word 3-grams, empty below 3 tokens") {
    val out = Seq((0L, "a b c d"), (1L, "a b"), (2L, "x x x x"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .orderBy("doc_id")
      .as[(Long, Seq[String])].collect()
    assert(out(0)._2.toSet === Set("a b c", "b c d"))
    assert(out(1)._2.isEmpty)
    assert(out(2)._2.toSeq === Seq("x x x")) // distinct collapses repeats
  }

  test("positional (non-distinct) hashed shingles: index i = gram at " +
    "token i, values = xxhash64 of the concat_ws gram (round-17 kernel)") {
    import graft.operators.TermStats
    val df = Seq((0L, "a b a b a"), (1L, "x y")).toDF("doc_id", "text")
    val viaKernel = df.select(col("doc_id"),
        TermStats.hashedGrams(TermStats.cleanWords(col("text")), 2,
          distinct = false).as("h"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect()
    val viaHof = df.select(col("doc_id"),
        transform(TermStats.ngrams(TermStats.cleanWords(col("text")), 2),
          g => xxhash64(g)).as("h"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect()
    assert(viaKernel.toSeq === viaHof.toSeq)
    // duplicates preserved positionally: "a b" appears at 0 and 2
    assert(viaKernel(0)._2.length === 4)
    assert(viaKernel(0)._2(0) === viaKernel(0)._2(2))
    // distinct mode: same values, first-occurrence dedup
    val dist = df.filter(col("doc_id") === 0L).select(
        TermStats.hashedGrams(TermStats.cleanWords(col("text")), 2,
          distinct = true).as("h"))
      .as[Seq[Long]].collect().head
    assert(dist === viaKernel(0)._2.distinct)
  }

  test("nearDupPairs finds exact+near duplicates, not unrelated docs") {
    val pairs = Dedup.nearDupPairs(docs, col("doc_id"), col("text"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))  // identical → jaccard 1.0
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("nearDupPairs jaccard values are exact") {
    val j = Dedup.nearDupPairs(docs, col("doc_id"), col("text"))
      .filter(col("doc_a") === 0 && col("doc_b") === 1)
      .select("jaccard").as[Double].head()
    assert(j === 1.0)
  }

  test("nearDedup keeps smallest representative of each cluster") {
    val kept = Dedup.nearDedup(docs, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(0L, 3L, 4L))
  }

  test("nearDupPairsAgainst flags only new docs that duplicate the corpus") {
    // corpus = docs 0/3/4; new batch = 1 (exact dup of 0), 2 (near dup
    // of 0), 5 (fresh)
    val corpus = docs.filter(col("doc_id").isin(0L, 3L, 4L))
    val batch = docs.filter(col("doc_id").isin(1L, 2L))
      .union(Seq((5L, "entirely novel text with no overlap whatsoever " +
        "against anything stored before")).toDF("doc_id", "text"))
    val pairs = Dedup.nearDupPairsAgainst(batch, corpus,
        col("doc_id"), col("text"))
      .select("doc_new", "doc_corpus").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 0L), (2L, 0L)))
    // survivors: the batch minus the flagged dups
    val kept = Dedup.nearDedupAgainst(batch, corpus, col("doc_id"),
        col("text"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(5L))
    // jaccard is exact on the asymmetric path too
    val j = Dedup.nearDupPairsAgainst(batch, corpus, col("doc_id"),
        col("text"))
      .filter(col("doc_new") === 1L).select("jaccard").as[Double].head()
    assert(j === 1.0)
  }

  test("lshParityAudit: identical docs match on every component and " +
      "band; audit columns are exact") {
    val out = Dedup.lshParityAudit(docs, col("doc_id"), col("text"))
      .orderBy("doc_a", "doc_b").collect()
    val byPair = out.map(r => ((r.getLong(0), r.getLong(1)), r)).toMap
    // 0 and 1 are byte-identical: all 16 components match, all 4
    // bands shared, est = exact = 1.0
    val r01 = byPair((0L, 1L))
    assert(r01.getAs[Long]("n_shared_bands") === 4L)
    assert(r01.getAs[Long]("n_match_sig") === 16L)
    assert(r01.getAs[Double]("est_jaccard") === 1.0)
    assert(r01.getAs[Double]("exact_jaccard") === 1.0)
    // 2 is the 0.9-jaccard near-dup: its exact value is exactly 9/10
    // and at least one band must collide for it to appear at all
    byPair.get((0L, 2L)).foreach { r =>
      assert(r.getAs[Double]("exact_jaccard") === 0.9)
      assert(r.getAs[Long]("n_shared_bands") >= 1L)
    }
    // no candidate pair involves the unrelated doc 3
    assert(!out.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }

  test("lshParityAudit is partitioning-invariant") {
    val many = (0L until 60L).map { i =>
      (i, if (i % 3 == 0) base.trim else s"unique text $i " + base.take(40))
    }.toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.lshParityAudit(df, col("doc_id"), col("text"))
        .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(run(many.repartition(1)) === run(many.repartition(13)))
  }

  test("winnowPairs: the positional guarantee — a shared run of " +
      "window+shingleN-1 tokens yields a shared fingerprint") {
    // window=4, shingleN=3: any shared 6-token run gives 4 consecutive
    // shared gram hashes = one full shared window -> same min selected
    val run = "omega psi chi phi upsilon tau"
    val df = Seq(
      (0L, s"aaa bbb ccc $run ddd eee fff ggg hhh iii jjj kkk"),
      (1L, s"one two three four five $run six seven eight nine ten"),
      (2L, "totally unrelated words with nothing from the planted run " +
        "at all here just filler tokens going on and on"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(df, col("doc_id"), col("text"),
        minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "shared run must share a fingerprint")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("winnowPairs: identical docs share ALL fingerprints " +
      "(jaccard_fp = 1) and the audit counts are consistent") {
    val df = Seq((0L, base.trim), (1L, base.trim), (2L, "short text only"))
      .toDF("doc_id", "text")
    val out = Dedup.winnowPairs(df, col("doc_id"), col("text"),
        minShared = 1)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === ((0L, 1L)))
    assert(r.getAs[Long]("n_fp_a") === r.getAs[Long]("n_fp_b"))
    assert(r.getAs[Long]("n_shared") === r.getAs[Long]("n_fp_a"))
    assert(r.getAs[Double]("jaccard_fp") === 1.0)
  }

  test("winnowPairs is partitioning-invariant; fingerprint density " +
      "is near the 2/(w+1) theory bound") {
    val texts = (0L until 40L).map { i =>
      (i, if (i % 4 == 0) base.trim
          else s"doc $i " + (s"tok${i % 11} " * 30) + base.take(60))
    }
    val df = texts.toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.winnowPairs(d, col("doc_id"), col("text"))
        .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(run(df.repartition(1)) === run(df.repartition(13)))
  }

  test("minhash signature is deterministic and partitioning-invariant") {
    val sig = (n: Int) => docs.repartition(n)
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 32).as("sig"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    assert(sig(1) === sig(5))
  }

  // SimHash needs MANY features for its vote margins to concentrate
  // (flip probability per bit ~ changed/sqrt(total)); the tiny `docs`
  // above (9 shingles) flip ~half their margin-1 bits on a single edit.
  // These docs mirror the fixture regime: ~300 distinct shingles.
  private val bigDocs = {
    val rnd = new scala.util.Random(7)
    val vocab = Array.fill(500)(rnd.alphanumeric.take(6).mkString)
    def fresh() = Array.fill(300)(vocab(rnd.nextInt(vocab.length)))
    val d0 = fresh()
    val d2 = d0.clone(); for (i <- Seq(50, 150, 250)) d2(i) = "changed" + i
    Seq((0L, d0.mkString(" ")), (1L, d0.mkString(" ")),
      (2L, d2.mkString(" ")), (3L, fresh().mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("simhash: identical docs hash identically; near-dups within small hamming") {
    val sims = bigDocs.select(col("doc_id"),
        Dedup.simhash(Dedup.shingles(col("text"), 3)).as("sim"))
      .orderBy("doc_id").as[(Long, Long)].collect().toMap
    assert(sims(0L) === sims(1L)) // identical text → identical hash
    val near = java.lang.Long.bitCount(sims(0L) ^ sims(2L))
    val far = java.lang.Long.bitCount(sims(0L) ^ sims(3L))
    assert(near <= 3, s"near-dup hamming $near")
    assert(far > 10, s"unrelated hamming $far")
  }

  test("md5Prefix60 kernel equals the SQL conv(substring(md5)) definition") {
    // the oracle-parity contract: the byte-level digest-prefix kernel
    // must agree with the SQL/hex formulation on every gram, including
    // unicode and digests whose leading nibble is >= 8 (sign hazard)
    val sqlForm = transform(Dedup.shinglesFromTokens(col("_t"), 3),
      g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))
    val rows = bigDocs.union(Seq((9L, "tiếng Việt có dấu thử nghiệm φ ∂ 漢字 test"))
        .toDF("doc_id", "text"))
      .select(split(col("text"), "\\s+").as("_t"))
      .select(Dedup.md5GramHashes(col("_t"), 3).as("fast"), sqlForm.as("sql"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (fast, sql) => assert(fast === sql) }
    assert(rows.exists(_._1.nonEmpty))
  }

  test("simhashNearDupPairs finds the planted cluster, skips unrelated") {
    val pairs = Dedup.simhashNearDupPairs(bigDocs, col("doc_id"), col("text"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("language-ID picks the profile with the most stopword hits") {
    val df = Seq(
      (0L, "the cat of the house and the dog is that"),
      (1L, "der hund und die katze ist nicht ein der"),
      (2L, "el perro y la casa que de los un"),
      (3L, "le chien et les maisons des est une que"),
    ).toDF("doc_id", "text")
    val out = TextStats.addLangId(df, col("text"))
      .select("doc_id", "lang_pred").orderBy("doc_id")
      .as[(Long, String)].collect().map(_._2)
    assert(out.toSeq === Seq("en", "de", "es", "fr"))
  }

  test("text stats goldens") {
    val r = TextStats.addStats(Seq((0L, "ab cd, ef!")).toDF("doc_id", "text"),
        col("text"))
      .select("n_chars", "n_tokens", "avg_token_len", "punct_ratio")
      .head()
    assert(r.getLong(0) === 10L)
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 8.0 / 3.0)
    assert(r.getDouble(3) === 2.0 / 10.0)
  }
}
