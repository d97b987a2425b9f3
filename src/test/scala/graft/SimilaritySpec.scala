package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Goldens for ANN search: exact brute force on planted geometry, and
  * LSH recall on planted near-duplicates (where ANN must work) plus
  * pruning behavior on the near-random fixture (where it must prune).
  */
class SimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 64
  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextGaussian().toFloat)
  }
  private def perturb(v: Array[Float], eps: Float, seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    v.map(x => x + eps * r.nextGaussian().toFloat)
  }

  // ids 0..4: independent random; 100+i: near-copy of i (cos ≈ 0.995)
  private val planted = {
    val bases = (0 to 4).map(i => (i.toLong, vec(i)))
    val copies = bases.map { case (i, v) => (100L + i, perturb(v, 0.05f, 1000 + i.toInt)) }
    val noise = (10 to 59).map(i => (i.toLong, vec(i * 7 + 1)))
    (bases ++ copies ++ noise).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  test("bruteForceTopK: the planted near-copy is rank 1 for every query") {
    val out = Similarity.bruteForceTopK(planted, col("vec_id"),
        col("embedding"), Seq(0L, 1L, 2L, 3L, 4L), 3)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(out === Map(0L -> 100L, 1L -> 101L, 2L -> 102L, 3L -> 103L, 4L -> 104L))
  }

  test("cosine is symmetric and 1.0 on identical vectors") {
    val df = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(1.0, 2.0, 3.0)))
      .toDF("id", "v")
    val c = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(Similarity.cosine(col("a.v"), col("b.v"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-15)
  }

  test("lshTopK: planted near-duplicates are recalled at rank 1") {
    val out = Similarity.lshTopK(planted, col("vec_id"), col("embedding"),
        Seq(0L, 1L, 2L, 3L, 4L), 3, dim)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(out === Map(0L -> 100L, 1L -> 101L, 2L -> 102L, 3L -> 103L, 4L -> 104L))
  }

  test("lshTopK prunes: candidate work on the fixture is a fraction of brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    // count candidate pairs the LSH join produces (pre-ranking) by
    // running with k = corpus size and counting rows per query
    val cand = Similarity.lshTopK(emb, col("vec_id"), col("embedding"),
        Seq(0L, 1L, 2L), n.toInt, dim)
      .groupBy("query_id").count().select("count").as[Long].collect()
    assert(cand.nonEmpty)
    // each query must examine well under half the corpus
    assert(cand.forall(_ < n / 2), s"candidates per query: ${cand.toSeq} of $n")
  }

  test("cosineNearDupPairs finds planted near-copies, no all-pairs blowup") {
    val pairs = Similarity.cosineNearDupPairs(planted, col("vec_id"),
        col("embedding"), threshold = 0.9, dim = dim)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((0 to 4).forall(i => pairs.contains((i.toLong, 100L + i))))
    // random noise vectors must not pair at 0.9
    assert(pairs.forall { case (a, b) => b == a + 100 })
  }

  test("ivfTopK: planted near-duplicates are recalled at rank 1") {
    val out = Similarity.ivfTopK(planted, col("vec_id"), col("embedding"),
        Seq(0L, 1L, 2L, 3L, 4L), 3, c = 8, nprobe = 2)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(out === Map(0L -> 100L, 1L -> 101L, 2L -> 102L, 3L -> 103L, 4L -> 104L))
  }

  test("ivf index is deterministic across partitionings") {
    val run = (p: Int) => Similarity.ivfTopK(planted.repartition(p),
        col("vec_id"), col("embedding"), Seq(0L, 1L, 2L), 5, c = 8, nprobe = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long)].collect().toSeq
    assert(run(1) === run(6))
  }

  test("persisted IVF index: probe == inline build, plan reads ONLY " +
      "the saved tables, bucketed corpus side joins exchange-free") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivf-idx").toString
    try {
      Similarity.ivfBuildIndex(planted, col("vec_id"), col("embedding"),
        assignTable = "graft_ivf_assign", centroidTable = "graft_ivf_cent",
        path = base, c = 8, iterations = 2, buckets = 4)
      val inline = Similarity.ivfTopK(planted, col("vec_id"),
          col("embedding"), Seq(0L, 1L, 2L, 3L, 4L), 3, c = 8, nprobe = 2)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Long)].collect().toSeq
      val probeDf = Similarity.ivfProbeIndex(spark, "graft_ivf_assign",
        "graft_ivf_cent", Seq(0L, 1L, 2L, 3L, 4L), 3, nprobe = 2)
      val probed = probeDf.orderBy("query_id", "rank")
        .as[(Long, Long, Long)].collect().toSeq
      assert(probed === inline, "probe must equal the inline build")
      // build-skip: the probe plan scans the saved index path only —
      // no raw-corpus scan, no k-means/assignment recompute
      val p = probeDf.queryExecution.executedPlan.toString
      assert(p.contains("assign"), p.take(600))
      assert(!p.contains("embeddings"), "probe must not rescan the corpus")
      // the bucketed layout: a non-broadcast cluster-keyed join
      // against the assignments exchanges ONLY the probe side — the
      // corpus side reads its buckets in place (one Exchange total;
      // an unbucketed corpus would need two)
      val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val probes = Seq((0, 0L), (1, 1L)).toDF("_cluster", "qid")
        val j = spark.table("graft_ivf_assign").join(probes, "_cluster")
        val jp = j.queryExecution.executedPlan.toString
        assert("Exchange hashpartitioning".r.findAllIn(jp).size === 1,
          jp.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
        assert(j.count() > 0)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ivf_assign")
      spark.sql("DROP TABLE IF EXISTS graft_ivf_cent")
    }
  }

  test("persisted LSH index: probe == inline hashing, no raw-corpus " +
      "rescan") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-lsh-idx").toString
    try {
      Similarity.lshBuildIndex(planted, col("vec_id"), col("embedding"),
        table = "graft_lsh_idx", path = base, dim = dim)
      val inline = Similarity.lshTopK(planted, col("vec_id"),
          col("embedding"), Seq(0L, 1L, 2L, 3L, 4L), 3, dim)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Long)].collect().toSeq
      val probeDf = Similarity.lshProbeIndex(spark, "graft_lsh_idx",
        Seq(0L, 1L, 2L, 3L, 4L), 3)
      val probed = probeDf.orderBy("query_id", "rank")
        .as[(Long, Long, Long)].collect().toSeq
      assert(probed === inline && probed.nonEmpty)
      val p = probeDf.queryExecution.executedPlan.toString
      assert(!p.contains("embeddings"), "probe must not rescan the corpus")
    } finally spark.sql("DROP TABLE IF EXISTS graft_lsh_idx")
  }

  test("INCREMENTAL LSH append: build + append == full rebuild, " +
      "appended vectors are discoverable (round-14 verdict #6)") {
    // hyperplanes are a pure (seed, dim, bits, tables) function —
    // no training state — so appending an increment must yield the
    // EXACT index a full rebuild over corpus ∪ increment produces.
    val baseA = java.nio.file.Files
      .createTempDirectory("graft-lsh-app").toString
    val baseB = java.nio.file.Files
      .createTempDirectory("graft-lsh-full").toString
    // increment = the planted near-copies; corpus = everything else
    val increment = planted.filter(col("vec_id") >= 100L)
    val corpus = planted.filter(col("vec_id") < 100L)
    try {
      Similarity.lshBuildIndex(corpus, col("vec_id"), col("embedding"),
        table = "graft_lsh_app", path = baseA, dim = dim)
      // before the append the near-copies are absent from the index
      val before = Similarity.lshProbeIndex(spark, "graft_lsh_app",
          Seq(0L, 1L, 2L, 3L, 4L), 1)
        .as[(Long, Long, Long)].collect()
      assert(before.forall(_._2 < 100L))
      Similarity.lshAppendIndex(increment, col("vec_id"),
        col("embedding"), table = "graft_lsh_app", dim = dim)
      Similarity.lshBuildIndex(planted, col("vec_id"), col("embedding"),
        table = "graft_lsh_full", path = baseB, dim = dim)
      val appended = Similarity.lshProbeIndex(spark, "graft_lsh_app",
          Seq(0L, 1L, 2L, 3L, 4L), 3)
        .orderBy("query_id", "rank").as[(Long, Long, Long)].collect().toSeq
      val rebuilt = Similarity.lshProbeIndex(spark, "graft_lsh_full",
          Seq(0L, 1L, 2L, 3L, 4L), 3)
        .orderBy("query_id", "rank").as[(Long, Long, Long)].collect().toSeq
      assert(appended === rebuilt && appended.nonEmpty,
        "append must equal a full rebuild over corpus ∪ increment")
      // the appended near-copies win rank 1 — zero-rebuild discovery
      appended.filter(_._3 == 1L).foreach { case (q, n, _) =>
        assert(n === q + 100L, s"query $q rank-1 should be its copy")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_lsh_app")
      spark.sql("DROP TABLE IF EXISTS graft_lsh_full")
    }
  }

  test("LSH append is order-associative: two sequential appends == one " +
      "rebuild over all three slices, either append order (round-15 " +
      "sweep item: the sequentialized form of two concurrent callers)") {
    // hyperplanes are seed-pure and the index rows are per-vector, so
    // appends commute — the only thing two CONCURRENT appenders could
    // corrupt is the catalog file-commit itself, which saveAsTable
    // does not serialize across writers (see lshAppendIndex scaladoc)
    val sliceA = planted.filter(col("vec_id") >= 100L && col("vec_id") % 2 === 0)
    val sliceB = planted.filter(col("vec_id") >= 100L && col("vec_id") % 2 === 1)
    val corpus = planted.filter(col("vec_id") < 100L)
    val dirs = (0 until 3).map(_ => java.nio.file.Files
      .createTempDirectory("graft-lsh-assoc").toString)
    try {
      Similarity.lshBuildIndex(corpus, col("vec_id"), col("embedding"),
        table = "graft_lsh_ab", path = dirs(0), dim = dim)
      Similarity.lshAppendIndex(sliceA, col("vec_id"), col("embedding"),
        table = "graft_lsh_ab", dim = dim)
      Similarity.lshAppendIndex(sliceB, col("vec_id"), col("embedding"),
        table = "graft_lsh_ab", dim = dim)
      Similarity.lshBuildIndex(corpus, col("vec_id"), col("embedding"),
        table = "graft_lsh_ba", path = dirs(1), dim = dim)
      Similarity.lshAppendIndex(sliceB, col("vec_id"), col("embedding"),
        table = "graft_lsh_ba", dim = dim)
      Similarity.lshAppendIndex(sliceA, col("vec_id"), col("embedding"),
        table = "graft_lsh_ba", dim = dim)
      Similarity.lshBuildIndex(planted, col("vec_id"), col("embedding"),
        table = "graft_lsh_all", path = dirs(2), dim = dim)
      def probe(t: String) = Similarity.lshProbeIndex(spark, t,
          Seq(0L, 1L, 2L, 3L, 4L), 3)
        .orderBy("query_id", "rank").as[(Long, Long, Long)].collect().toSeq
      val ab = probe("graft_lsh_ab")
      assert(ab === probe("graft_lsh_ba") && ab === probe("graft_lsh_all")
        && ab.nonEmpty, "append must commute and equal the full rebuild")
    } finally {
      Seq("graft_lsh_ab", "graft_lsh_ba", "graft_lsh_all").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("INCREMENTAL IVF append: frozen-centroid assignment — append " +
      "== one-shot assignment of the union against the same centroids") {
    // IVF training state is the centroid set; the append contract is
    // freeze-and-assign (re-train on a cadence, append between
    // trainings), so the pin is equality against assigning the WHOLE
    // union under the frozen centroids — not against a k-means re-run,
    // whose centroids would drift with the increment.
    val baseA = java.nio.file.Files
      .createTempDirectory("graft-ivf-app").toString
    val increment = planted.filter(col("vec_id") >= 100L)
    val corpus = planted.filter(col("vec_id") < 100L)
    try {
      Similarity.ivfBuildIndex(corpus, col("vec_id"), col("embedding"),
        assignTable = "graft_ivf_app", centroidTable = "graft_ivf_appc",
        path = baseA, c = 8, iterations = 2, buckets = 4)
      val before = Similarity.ivfProbeIndex(spark, "graft_ivf_app",
          "graft_ivf_appc", Seq(0L, 1L, 2L, 3L, 4L), 1, nprobe = 2)
        .as[(Long, Long, Long)].collect()
      assert(before.forall(_._2 < 100L))
      Similarity.ivfAppendIndex(increment, col("vec_id"),
        col("embedding"), assignTable = "graft_ivf_app",
        centroidTable = "graft_ivf_appc", buckets = 4)
      // reference: one-shot frozen assignment of corpus ∪ increment
      // (append-to-fresh-table creates it) against the SAME centroids
      Similarity.ivfAppendIndex(planted, col("vec_id"), col("embedding"),
        assignTable = "graft_ivf_ref", centroidTable = "graft_ivf_appc",
        buckets = 4)
      val appended = Similarity.ivfProbeIndex(spark, "graft_ivf_app",
          "graft_ivf_appc", Seq(0L, 1L, 2L, 3L, 4L), 3, nprobe = 2)
        .orderBy("query_id", "rank").as[(Long, Long, Long)].collect().toSeq
      val oneShot = Similarity.ivfProbeIndex(spark, "graft_ivf_ref",
          "graft_ivf_appc", Seq(0L, 1L, 2L, 3L, 4L), 3, nprobe = 2)
        .orderBy("query_id", "rank").as[(Long, Long, Long)].collect().toSeq
      assert(appended === oneShot && appended.nonEmpty,
        "append must equal one-shot frozen-centroid assignment")
      // appended near-copies land in their base's cluster (a copy at
      // cos ≈ 0.995 shares the nearest centroid) — rank 1 per query
      appended.filter(_._3 == 1L).foreach { case (q, n, _) =>
        assert(n === q + 100L, s"query $q rank-1 should be its copy")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ivf_app")
      spark.sql("DROP TABLE IF EXISTS graft_ivf_appc")
      spark.sql("DROP TABLE IF EXISTS graft_ivf_ref")
    }
  }

  test("lshTopK EQUALS bruteForceTopK on a strong-neighbor corpus") {
    // Every true top-5 neighbor is a near-copy at cos >= 0.99: per the
    // sign-LSH recall formula (Similarity.lshTopK scaladoc), a
    // neighbor at cos 0.99 (theta ~ 0.14 rad) survives a 6-bit band
    // with p ~ 0.76, so across 8 tables the miss probability is
    // ~1e-5 per neighbor — and the fixture is fully seeded, so the
    // outcome is deterministic. The approximate path must therefore
    // reproduce the exact path VERBATIM: same neighbors, same ranks.
    val bases = (0 to 4).map(i => (i.toLong, vec(i)))
    val copies = bases.flatMap { case (i, v) =>
      (1 to 5).map(j =>
        (100L + 10 * i + j, perturb(v, 0.02f * j, 2000 + 10 * i.toInt + j)))
    }
    val noise = (10 to 59).map(i => (i.toLong, vec(i * 13 + 5)))
    val corpus = (bases ++ copies ++ noise)
      .map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")

    val queries = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteForceTopK(corpus, col("vec_id"),
        col("embedding"), queries, 5)
      .orderBy("query_id", "rank").as[(Long, Long, Long)].collect().toSeq
    val approx = Similarity.lshTopK(corpus, col("vec_id"),
        col("embedding"), queries, 5, dim)
      .orderBy("query_id", "rank").as[(Long, Long, Long)].collect().toSeq
    // sanity: the exact top-5 really is the planted copy set
    val exactSets = exact.groupBy(_._1).map { case (q, rows) =>
      q -> rows.map(_._2).toSet }
    queries.foreach { q =>
      assert(exactSets(q) === (1 to 5).map(j => 100L + 10 * q + j).toSet)
    }
    assert(approx === exact)
  }

  test("lsh results are deterministic across partitionings") {
    val run = (p: Int) => Similarity.lshTopK(planted.repartition(p),
        col("vec_id"), col("embedding"), Seq(0L, 1L, 2L), 5, dim)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long)].collect().toSeq
    assert(run(1) === run(6))
  }
}
