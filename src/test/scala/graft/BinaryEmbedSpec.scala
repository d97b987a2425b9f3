package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BinaryEmbed

/** Binary signature packing, Hamming top-k, and int8 quantization. */
class BinaryEmbedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def vec(posDims: Set[Int]): Array[Float] =
    (1 to 64).map(i => if (posDims(i)) 1.0f else -1.0f).toArray

  test("signature packs bit (i-1) of the low word, (i-33) of the high") {
    val df = Seq(
      (0L, vec(Set(1))), // lo bit 0
      (1L, vec(Set(32))), // lo bit 31
      (2L, vec(Set(33))), // hi bit 0
      (3L, vec(Set(64))), // hi bit 31
      (4L, vec((1 to 64).toSet)) // all ones
    ).toDF("vec_id", "embedding")
    val out = BinaryEmbed.withBinarySignature(df, col("embedding"))
      .select("vec_id", "sig_lo", "sig_hi")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (0L, 1L, 0L),
      (1L, 1L << 31, 0L),
      (2L, 0L, 1L),
      (3L, 0L, 1L << 31),
      (4L, 0xFFFFFFFFL, 0xFFFFFFFFL)))
  }

  test("hammingTopK ranks by exact bit disagreement, ties by id") {
    // query 0: all-negative. neighbors flip k dims → hamming = k.
    val df = Seq(
      (0L, vec(Set.empty[Int])),
      (1L, vec(Set(5))), // d=1
      (2L, vec(Set(5, 40))), // d=2
      (3L, vec(Set(5, 40, 64))), // d=3
      (4L, vec(Set(1, 2, 3, 4))), // d=4
      (5L, vec(Set(7))) // d=1, tie with id 1 → after it
    ).toDF("vec_id", "embedding")
    val out = BinaryEmbed.hammingTopK(df, col("vec_id"), col("embedding"),
        Seq(0L), 4)
      .select("neighbor_id", "hamming", "rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3).toSeq
    assert(out === Seq((1L, 1L, 1), (5L, 1L, 2), (2L, 2L, 3), (3L, 3L, 4)))
  }

  test("intLshTopK surfaces a planted near-parallel neighbor at rank 1") {
    // id 10 is id 0 with a tiny perturbation — near-parallel, so all
    // sign-LSH tables bucket them together and the exact cosine rerank
    // must put it first; orthogonal-ish noise rows rank below or miss
    val base = Array.tabulate(64)(j => if (j % 3 == 0) 0.8f else -0.5f)
    val near = base.clone(); near(1) = near(1) + 0.01f
    val rows = Seq((0L, base), (10L, near)) ++ (1L until 8L).map { i =>
      (i, Array.tabulate(64)(j => if ((j + i) % 7 < 3) 0.6f else -0.6f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = BinaryEmbed.intLshTopK(df, col("vec_id"), col("embedding"),
        Seq(0L), 3)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(out.find(_._2 == 1).map(_._1) === Some(10L))
    // invariant under partitioning
    val again = BinaryEmbed.intLshTopK(df.repartition(7), col("vec_id"),
        col("embedding"), Seq(0L), 3)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(again === out)
  }

  test("knnLabelEval: separable labels score perfectly, probes content-addressed") {
    import graft.operators.Sampling
    // two well-separated sign clusters, one per label: every probe's
    // 5 nearest neighbors share its label, so accuracy must be 100%
    val df = (0L until 60L).map { i =>
      val lab = (i % 2).toInt
      val flip = (i % 7).toInt + 1 // small within-cluster variation
      val dims = if (lab == 0) Set(flip) else (1 to 64).toSet - flip
      (i, vec(dims), lab)
    }.toDF("vec_id", "embedding", "label")
    val out = BinaryEmbed.knnLabelEval(df, col("vec_id"), col("embedding"),
        col("label"), probeMod = 4, k = 5)
      .select("label", "n_probes", "n_correct")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out.forall { case (_, n, c) => c === n })
    // the probe count per label matches the content-addressed sample
    val probes = df.filter(Sampling.hashBucket(col("vec_id"), 4) === 0)
      .groupBy("label").count().as[(Int, Long)].collect().toMap
    assert(out.map(t => t._1 -> t._2).toMap === probes)
    // invariant under partitioning
    val again = BinaryEmbed.knnLabelEval(df.repartition(9), col("vec_id"),
        col("embedding"), col("label"), probeMod = 4, k = 5)
      .select("label", "n_probes", "n_correct")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(again === out)
  }

  test("hammingHardNegatives excludes same-label rows however close") {
    // id 1 is IDENTICAL to the query but shares its label — a perfect
    // positive, never a negative; the mined negatives must be the
    // nearest different-label rows only
    val df = Seq(
      (0L, vec(Set.empty[Int]), 7),
      (1L, vec(Set.empty[Int]), 7), // same label, hamming 0 — excluded
      (2L, vec(Set(5)), 8), // d=1, different label
      (3L, vec(Set(5, 40)), 9), // d=2, different label
      (4L, vec(Set(1, 2, 3)), 7), // same label — excluded
      (5L, vec(Set(6)), 8) // d=1, tie with id 2 → after it
    ).toDF("vec_id", "embedding", "label")
    val out = BinaryEmbed.hammingHardNegatives(df, col("vec_id"),
        col("embedding"), col("label"), Seq(0L), 3)
      .select("neighbor_id", "neighbor_label", "hamming", "rank")
      .as[(Long, Int, Long, Int)].collect().sortBy(_._4).toSeq
    assert(out === Seq((2L, 8, 1L, 1), (5L, 8, 1L, 2), (3L, 9, 2L, 3)))
  }

  test("quantizeInt8: golden values, max maps to ±127") {
    val df = Seq((0L, Array(1.0f, -0.5f, 0.25f, 0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val out = BinaryEmbed.quantizeInt8(df, col("embedding"))
      .select("q_scale", "q_vec")
      .as[(Double, Array[Int])].collect().head
    assert(out._1 === 127.0)
    // floor(x*127 + 0.5): 127, -63 (floor(-63.0)), 32 (floor(32.25)), 0, -127 (floor(-126.5))
    assert(out._2.toSeq === Seq(127, -63, 32, 0, -127))
  }

  test("quantization error is bounded by 1/(2·scale)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(50)
    val rows = BinaryEmbed.quantizeInt8(emb, col("embedding"))
      .select("embedding", "q_scale", "q_vec")
      .as[(Array[Float], Double, Array[Int])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, scale, q) =>
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x - qi / scale) <= 0.5 / scale + 1e-12)
      }
    }
  }

  test("intCosineNearDupPairs finds planted near-dups, skips unrelated") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(64)(rnd.nextFloat() - 0.5f)
    val near = base.clone(); near(7) += 0.01f // cosine ~ 1
    val anti = base.map(-_)                   // cosine -1: num <= 0 gate
    val noise = (0 until 20).map(i =>
      (10L + i, Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = (Seq((0L, base), (1L, near), (2L, anti)) ++ noise)
      .toDF("vec_id", "embedding")
    val pairs = BinaryEmbed.intCosineNearDupPairs(df, col("vec_id"),
        col("embedding"), tPct = 90)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("intCosineNearDupPairs is invariant under input partitioning") {
    val rnd = new scala.util.Random(3)
    val docs = (0 until 40).map { i =>
      val v = Array.fill(64)(rnd.nextFloat() - 0.5f)
      (i.toLong, v)
    }
    def run(parts: Int) = BinaryEmbed.intCosineNearDupPairs(
        docs.toDF("vec_id", "embedding").repartition(parts),
        col("vec_id"), col("embedding"), tPct = 30)
      .select("id_a", "id_b", "num").as[(Long, Long, Long)]
      .collect().toSet
    assert(run(1) === run(7))
  }

  test("signature build plans as a narrow projection — no shuffle") {
    val plan = BinaryEmbed.withBinarySignature(
        Tables.embeddings(spark, "/root/testdata/sf0.001"), col("embedding"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }
}
