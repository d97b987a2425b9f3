package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.StreamingBloomDedup

/** ScalaCheck properties for the bounded-state Bloom dedup's batch
  * mode: on random dup-heavy corpora and random shard counts, the
  * emitted rows must be exactly one per distinct key carrying the
  * key's minimum ord — i.e. equal to exact dedup (the filter is sized
  * so the deterministic FP count is zero at these corpus sizes; the
  * chunked-stream side is pinned in StreamingBloomDedupSpec).
  */
object BloomDedupProperties extends Properties("StreamingBloomDedup") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  // 1-60 rows over a 12-key vocabulary: dense duplication, distinct
  // ords (the survivor contract needs a unique min per key)
  private val rowsGen: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 60)
    keys <- Gen.listOfN(n, Gen.oneOf((0 until 12).map(i => s"k$i")))
  } yield keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }

  property("batch firstSeen == exact dedup (min-ord survivor per key) " +
      "for any shard count") =
    forAll(rowsGen, Gen.choose(1, 8)) { (rows, shards) =>
      import spark.implicits._
      val got = StreamingBloomDedup.firstSeen(
          StreamingBloomDedup.observations(
            rows.toDF("k", "o"), col("k"), col("o"), shards),
          segLongs = 256)
        .collect().map(f => (f.key, f.ord)).toMap
      val want = rows.groupBy(_._1)
        .map { case (k, v) => (k, v.map(_._2).min) }
      got == want
    }
}
