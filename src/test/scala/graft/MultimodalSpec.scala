package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaMeta, MediaRow, Multimodal}

/** Plumbing specs for the multimodal column path: typed schema,
  * deterministic stub decode, batch shape, partition invariance.
  */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def row(id: Long, bytes: Array[Byte]) =
    MediaRow(id, bytes, MediaMeta("img", 4, 4, 3))

  private val data = Seq(
    row(0L, Array.tabulate(256)(_.toByte)),   // uniform byte spread
    row(1L, Array.fill(100)(0.toByte)),       // all in bucket 0
    row(2L, Array.empty[Byte]),               // empty payload
  )

  test("extractFeatures: fixed width, exact histogram, L1-normalized") {
    val out = Multimodal.extractFeatures(data.toDS(), featureDim = 16)
      .collect().sortBy(_.media_id)
    assert(out.forall(_.features.length === 16))
    assert(out(0).n_bytes === 256L)
    // uniform 0..255 → each of 16 buckets holds 16/256
    assert(out(0).features.forall(f => math.abs(f - 16f / 256f) < 1e-7))
    assert(out(1).features(0) === 1.0f)
    assert(out(1).features.drop(1).forall(_ === 0.0f))
    assert(out(2).n_bytes === 0L)
    assert(out(2).features.forall(_ === 0.0f))
  }

  test("extractFeatures is invariant under repartitioning") {
    val run = (p: Int) =>
      Multimodal.extractFeatures(data.toDS().repartition(p))
        .collect().sortBy(_.media_id).map(r => (r.media_id, r.n_bytes, r.features.toSeq)).toSeq
    assert(run(1) === run(3))
  }

  test("frame sampling: n evenly spaced slices, stable and bounded") {
    val bytes = Array.tabulate(100)(_.toByte)
    val frames = Multimodal.sampleFrames(bytes, 4, 10)
    assert(frames.length === 4)
    assert(frames.map(_.head & 0xff).toSeq === Seq(0, 25, 50, 75))
    assert(frames.forall(_.length <= 10))
    assert(Multimodal.sampleFrames(Array.empty[Byte], 4, 10).isEmpty)
  }

  test("explodeFrames emits one row per frame with indexes") {
    val out = Multimodal.explodeFrames(data.take(1).toDS(), 3, 8).collect()
    assert(out.length === 3)
    assert(out.map(_._2).sorted.toSeq === Seq(0, 1, 2))
    assert(out.forall(_._1 === 0L))
  }

  test("resizeFeatures average-pools to the target width, no shuffle") {
    val feats = Multimodal.extractFeatures(data.toDS(), featureDim = 16)
    val resized = Multimodal.resizeFeatures(feats, outDim = 4)
    // narrow map: no exchange in the plan
    assert(!resized.queryExecution.executedPlan.toString.contains("Exchange"))
    val out = resized.collect().sortBy(_.media_id)
    assert(out.forall(_.features.length === 4))
    // uniform histogram pools to uniform: 4 buckets of mean 16/256
    assert(out(0).features.forall(f => math.abs(f - 16f / 256f) < 1e-7))
    // all-zero-byte payload: mass stays in bucket 0 (mean of 4 buckets
    // where only the first held 1.0)
    assert(math.abs(out(1).features(0) - 0.25f) < 1e-7)
    // exact pooling golden on a hand vector
    assert(Multimodal.resizeVec(Array(1f, 3f, 5f, 7f), 2).toSeq === Seq(2f, 6f))
  }

  test("mediaSchema matches the typed Dataset schema") {
    assert(data.toDS().toDF().schema === Multimodal.mediaSchema)
  }
}
