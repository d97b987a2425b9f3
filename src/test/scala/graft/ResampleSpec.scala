package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Resample

/** Grid fill semantics + the max-buckets-per-key guard. */
class ResampleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // (key, ts, value) — key 1 has a gap between buckets 0 and 3
  private def base = Seq(
    (1L, 0L, 10.0), (1L, 35L, 13.0), // buckets 0 and 3 at step 10
    (2L, 10L, 20.0), (2L, 20L, 21.0),
  ).toDF("k", "t", "v")

  test("gridFill fills gaps forward on the bucket grid") {
    val out = Resample.gridFill(base, col("k"), col("t"), col("v"), 10L)
      .orderBy("key", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      (1L, 0L, 10.0), (1L, 1L, 10.0), (1L, 2L, 10.0), (1L, 3L, 13.0),
      (2L, 1L, 20.0), (2L, 2L, 21.0)))
  }

  test("a key spanning exactly the cap still fills") {
    // key 1 spans buckets 0..3 → 4 buckets: cap 4 is the boundary
    val out = Resample.gridFill(base, col("k"), col("t"), col("v"), 10L,
      maxBucketsPerKey = 4L)
    assert(out.count() === 6L)
  }

  test("a key spanning more than the cap fails with a named error") {
    // one pathological key: observations years apart at a fine step
    val patho = Seq((7L, 0L, 1.0), (7L, 1000000L, 2.0))
      .toDF("k", "t", "v")
    val ex = intercept[Exception] {
      Resample.gridFill(patho, col("k"), col("t"), col("v"), 1L,
        maxBucketsPerKey = 1000L).count()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("gridFill"))
    assert(msg.contains("key 7"))
    assert(msg.contains("maxBucketsPerKey=1000"))
    // the guard names the actual span
    assert(msg.contains("1000001"))
  }

  test("the guard is per-key: sane keys are unaffected by the cap") {
    val out = Resample.gridFill(base, col("k"), col("t"), col("v"), 10L,
      maxBucketsPerKey = 100L)
    assert(out.count() === 6L)
  }

  test("gridInterp interpolates linearly inside gaps, flags observations") {
    // key 1: observed 10.0 at bucket 0 and 13.0 at bucket 3 →
    // interior buckets get 11.0 and 12.0
    val out = Resample.gridInterp(base, col("k"), col("t"), col("v"), 10L)
      .orderBy("key", "bucket")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, 10.0, true), (1L, 1L, 11.0, false), (1L, 2L, 12.0, false),
      (1L, 3L, 13.0, true),
      (2L, 1L, 20.0, true), (2L, 2L, 21.0, true)))
  }

  test("gridInterp matches a brute-force scan on random gappy series") {
    val rnd = new scala.util.Random(17)
    val data = for { k <- 1L to 3L; b <- 0 until 40
      if rnd.nextDouble() < 0.3 || b == 0 || b == 39 }
      yield (k, b * 10L + rnd.nextInt(10),
        math.rint(rnd.nextGaussian() * 100) / 10.0)
    val out = Resample.gridInterp(data.toDF("k", "t", "v"), col("k"),
        col("t"), col("v"), 10L)
      .orderBy("key", "bucket")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val expect = data.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (k, rows) =>
        // max_by(t): latest event in a bucket wins
        val obs = rows.groupBy(_._2 / 10).map { case (b, rs) =>
          b -> rs.maxBy(_._2)._3
        }
        val (mn, mx) = (obs.keys.min, obs.keys.max)
        (mn to mx).map { b =>
          obs.get(b) match {
            case Some(v) => (k, b, v, true)
            case None =>
              val pb = obs.keys.filter(_ < b).max
              val nb = obs.keys.filter(_ > b).min
              val (pv, nv) = (obs(pb), obs(nb))
              (k, b, pv + (nv - pv) * ((b - pb).toDouble / (nb - pb)), false)
          }
        }
    }
    assert(out.toSeq === expect)
  }
}
