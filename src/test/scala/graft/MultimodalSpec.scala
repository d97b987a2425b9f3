package graft

import org.apache.spark.sql.functions.col
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

  /** Encode a BufferedImage as PNG bytes (JDK ImageIO, no deps). */
  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("REAL image resize: dimensions, solid color preserved, pipeline end-to-end") {
    // solid color survives any resample filter exactly
    val solid = Multimodal.imageResize(
      pngBytes(8, 8)((_, _) => 0x112233), 4, 4).get
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(solid))
    assert(img.getWidth === 4 && img.getHeight === 4)
    for (x <- 0 until 4; y <- 0 until 4)
      assert((img.getRGB(x, y) & 0xffffff) === 0x112233)
    // non-image payloads pass through untouched
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, pngBytes(8, 8)((_, _) => 0xff0000), MediaMeta("png", 8, 8, 3)),
      MediaRow(2L, Array[Byte](1, 2, 3), MediaMeta("bin", 0, 0, 0)))
    val out = Multimodal.resizeMedia(rows.toDS(), 2, 2)
      .collect().sortBy(_.media_id)
    assert(out(0).meta === MediaMeta("png", 2, 2, 3))
    val r0 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).content))
    assert(r0.getWidth === 2 && (r0.getRGB(0, 0) & 0xffffff) === 0xff0000)
    assert(out(1).content.toSeq === Seq[Byte](1, 2, 3))
    assert(out(1).meta.format === "bin")
  }

  test("REAL PNG decode: exact luminance histogram goldens") {
    val dim = 16
    // all-black 4x4: every pixel lum 0 → all mass in bucket 0
    val black = Multimodal.imageDecode(pngBytes(4, 4)((_, _) => 0x000000), dim).get
    assert(black(0) === 1.0f)
    assert(black.drop(1).forall(_ === 0.0f))
    // all-white: lum (255·299+255·587+255·114)/1000 = 255 → bucket 15
    val white = Multimodal.imageDecode(pngBytes(4, 4)((_, _) => 0xffffff), dim).get
    assert(white(15) === 1.0f)
    // pure green (0,255,0): lum = 255·587/1000 = 149 → bucket 149·16/256 = 9
    val green = Multimodal.imageDecode(pngBytes(2, 2)((_, _) => 0x00ff00), dim).get
    assert(green(9) === 1.0f)
    // half black / half white 2x2 → 0.5 in bucket 0, 0.5 in bucket 15
    val halves = Multimodal.imageDecode(
      pngBytes(2, 2)((x, _) => if (x == 0) 0x000000 else 0xffffff), dim).get
    assert(halves(0) === 0.5f && halves(15) === 0.5f)
  }

  test("PNG payloads take the real decode through extractFeatures") {
    val png = pngBytes(3, 3)((_, _) => 0xffffff)
    val rows = Seq(MediaRow(10L, png, MediaMeta("png", 3, 3, 3)))
    val out = Multimodal.extractFeatures(rows.toDS(), featureDim = 16).collect()
    assert(out.head.n_bytes === png.length.toLong)
    // real decode: white image → bucket 15; the byte-histogram stub
    // could not produce this (PNG bytes are spread by compression)
    assert(out.head.features(15) === 1.0f)
    assert(Multimodal.fakeDecode(png, 16)(15) !== 1.0f)
  }

  test("unparseable image payloads degrade to the stub, not a failure") {
    val junk = Array.tabulate(64)(_.toByte)
    assert(Multimodal.imageDecode(junk, 16).isEmpty)
    assert(Multimodal.decode(junk, "png", 16).toSeq ===
      Multimodal.fakeDecode(junk, 16).toSeq)
    // unparseable wav payloads degrade the same way
    assert(Multimodal.wavDecode(junk, 16).isEmpty)
    assert(Multimodal.decode(junk, "wav", 16).toSeq ===
      Multimodal.fakeDecode(junk, 16).toSeq)
    // video has no JDK codec: straight to the stub by design
    assert(Multimodal.decode(junk, "mp4", 16).toSeq ===
      Multimodal.fakeDecode(junk, 16).toSeq)
  }

  /** Encode 16-bit signed little-endian PCM samples as a RIFF/WAVE
    * payload (JDK javax.sound.sampled, no deps).
    */
  private def wavBytes(samples: Array[Short], channels: Int = 1): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, channels, true, false)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt,
      (samples.length / channels).toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("REAL WAV decode: exact amplitude histogram goldens") {
    val dim = 16
    // silence: sample 0 → unsigned 32768 → bucket 32768·16/65536 = 8
    val silent = Multimodal.wavDecode(wavBytes(Array.fill(64)(0: Short)), dim).get
    assert(silent(8) === 1.0f)
    assert(silent.zipWithIndex.filter(_._2 != 8).forall(_._1 === 0.0f))
    // full-scale negative → unsigned 0 → bucket 0
    val lo = Multimodal.wavDecode(wavBytes(Array.fill(10)(Short.MinValue)), dim).get
    assert(lo(0) === 1.0f)
    // full-scale positive 32767 → unsigned 65535 → bucket 15
    val hi = Multimodal.wavDecode(wavBytes(Array.fill(10)(Short.MaxValue)), dim).get
    assert(hi(15) === 1.0f)
    // half min / half max → 0.5 in bucket 0, 0.5 in bucket 15
    val mix = Multimodal.wavDecode(
      wavBytes(Array.fill(8)(Short.MinValue) ++ Array.fill(8)(Short.MaxValue)),
      dim).get
    assert(mix(0) === 0.5f && mix(15) === 0.5f)
  }

  test("WAV decode reads the FIRST channel of multi-channel PCM") {
    val dim = 16
    // interleaved stereo frames: ch0 = 0 (silence), ch1 = full-scale —
    // only ch0 contributes, so all mass sits in the silence bucket
    val stereo = Array.tabulate(32)(i =>
      if (i % 2 == 0) 0: Short else Short.MaxValue)
    val out = Multimodal.wavDecode(wavBytes(stereo, channels = 2), dim).get
    assert(out(8) === 1.0f)
  }

  test("WAV payloads take the real decode through extractFeatures") {
    val wav = wavBytes(Array.fill(32)(Short.MaxValue))
    val rows = Seq(MediaRow(20L, wav, MediaMeta("wav", 0, 0, 1)))
    val out = Multimodal.extractFeatures(rows.toDS(), featureDim = 16).collect()
    assert(out.head.n_bytes === wav.length.toLong)
    // real decode: full-scale samples → bucket 15; the byte-histogram
    // stub could not produce this (the RIFF header bytes spread out)
    assert(out.head.features(15) === 1.0f)
    assert(Multimodal.fakeDecode(wav, 16)(15) !== 1.0f)
  }

  /** A structured 64×64 test image: left-to-right gradient with a
    * bright square whose position is parameterized — near-identical
    * variants share most 8×8 cells, a moved square flips many.
    */
  private def scenePng(sqX: Int, sqY: Int, noise: Int = 0,
      gamma: Double = 1.0, shift: Int = 0): Array[Byte] =
    pngBytes(64, 64) { (x, y) =>
      val inSq = x >= sqX && x < sqX + 16 && y >= sqY && y < sqY + 16
      val base = if (inSq) 0xf0 else (x * 255 / 63) / 2
      val lin = math.min(255, math.max(0, base + ((x * 31 + y * 17) % 7) * noise))
      val v = math.min(255, shift +
        math.round(255.0 * math.pow(lin / 255.0, gamma)).toInt)
      (v << 16) | (v << 8) | v
    }

  test("aHash: re-encode-stable, noise-robust, scene-sensitive") {
    val a = Multimodal.aHash(scenePng(8, 8)).get
    val aNoisy = Multimodal.aHash(scenePng(8, 8, noise = 2)).get
    val moved = Multimodal.aHash(scenePng(40, 40)).get
    assert(a === Multimodal.aHash(scenePng(8, 8)).get) // deterministic
    assert(java.lang.Long.bitCount(a ^ aNoisy) <= 3, "mild noise is near-dup")
    assert(java.lang.Long.bitCount(a ^ moved) > 3, "moved scene is not")
    assert(Multimodal.aHash(Array[Byte](1, 2, 3)).isEmpty) // undecodable
  }

  test("pHash: deterministic, gamma-robust where aHash is not, " +
    "scene-sensitive") {
    val orig = scenePng(8, 8)
    val toned = scenePng(8, 8, gamma = 0.45) // same photo, tone-mapped
    val moved = scenePng(40, 40)
    val p = Multimodal.pHash(orig).get
    assert(p === Multimodal.pHash(orig).get) // deterministic
    assert(java.lang.Long.bitCount(p ^ Multimodal.pHash(toned).get) <= 3,
      "low-frequency structure survives the tone map")
    assert(java.lang.Long.bitCount(
      Multimodal.aHash(orig).get ^ Multimodal.aHash(toned).get) > 3,
      "aHash flips on the same tone map — the gap pHash exists to close")
    assert(java.lang.Long.bitCount(p ^ Multimodal.pHash(moved).get) > 3,
      "moved scene is not a near-dup")
    assert(Multimodal.pHash(Array[Byte](1, 2, 3)).isEmpty) // undecodable
    // EXACT invariance to a uniform (non-clipping) brightness offset
    // — the zero-meaned grid cancels the +10 before the DCT sees it
    val brighter = scenePng(8, 8, shift = 10)
    assert(Multimodal.pHash(brighter).get === p)
  }

  test("imageDctNearDupPairs catches the gamma-shifted dup aHash misses") {
    val media = Seq(
      (1L, scenePng(8, 8)), (2L, scenePng(8, 8, gamma = 0.45)),
      (3L, scenePng(40, 40)))
      .toDF("media_id", "content")
    val dct = Multimodal.imageDctNearDupPairs(media.repartition(2),
        col("media_id"), col("content"))
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    val avg = Multimodal.imageNearDupPairs(media.repartition(2),
        col("media_id"), col("content"))
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    assert(dct === Set((1L, 2L)))
    assert(avg === Set.empty)
  }

  /** Loud/quiet envelope track: 1024 frames in 64 segments of 16,
    * loud segments per `loudMask` bit, amplitude `amp` (+ small
    * per-frame jitter when `jitter` is set).
    */
  private def envelopeWav(loudMask: Long, amp: Short,
      jitter: Int = 0): Array[Byte] = {
    val samples = Array.tabulate(1024) { i =>
      val seg = i * 64 / 1024
      val base = if (((loudMask >> seg) & 1L) == 1L) amp.toInt else 0
      (base + (if (base > 0) (i * 7) % (jitter + 1) else 0)).toShort
    }
    wavBytes(samples)
  }

  test("audioHash: envelope-stable under jitter, distinct for a " +
    "different loud pattern, undecodable None") {
    val mask = 0x00ff00ff00ff00ffL
    val a = Multimodal.audioHash(envelopeWav(mask, 8000)).get
    val jittered = Multimodal.audioHash(envelopeWav(mask, 8000, jitter = 50)).get
    val other = Multimodal.audioHash(envelopeWav(~mask, 8000)).get
    assert(a === Multimodal.audioHash(envelopeWav(mask, 8000)).get)
    assert(a === mask, "loud segments above the track mean set their bits")
    assert(java.lang.Long.bitCount(a ^ jittered) <= 3)
    assert(java.lang.Long.bitCount(a ^ other) > 3)
    assert(Multimodal.audioHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("audioNearDupPairs finds the planted re-level pair only") {
    val mask = 0x0f0f0f0f0f0f0f0fL
    val media = Seq(
      (1L, envelopeWav(mask, 8000)),
      (2L, envelopeWav(mask, 9000, jitter = 40)), // re-leveled + noisy
      (3L, envelopeWav(~mask, 8000)))             // different material
      .toDF("media_id", "content")
    val pairs = Multimodal.audioNearDupPairs(media.repartition(2),
        col("media_id"), col("content"))
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("banded pair join: chunk count derives from maxHamming " +
    "(pigeonhole holds beyond the default 3)") {
    // audioHash(envelopeWav(mask)) === mask (pinned above), so the
    // planted Hamming distance is exact: 5 flipped bits spread so no
    // 16-bit quarter matches — the OLD fixed 4×16 banding would have
    // missed this pair entirely; deriving 6 chunks from maxHamming=5
    // guarantees one agrees.
    val mask = 0x0f0f0f0f0f0f0f0fL
    val far = mask ^ 0x1001001001001L // bits 0,12,24,36,48 → Hamming 5
    assert(java.lang.Long.bitCount(mask ^ far) === 5)
    val media = Seq((1L, envelopeWav(mask, 8000)),
      (2L, envelopeWav(far, 8000))).toDF("media_id", "content")
    def pairs(h: Int) = Multimodal.audioNearDupPairs(
        media.repartition(2), col("media_id"), col("content"),
        maxHamming = h)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    assert(pairs(5) === Set((1L, 2L)))
    assert(pairs(4) === Set.empty) // verify threshold still exact
    intercept[IllegalArgumentException](pairs(16)) // bound guard
  }

  test("imageNearDupPairs finds planted perceptual dups only") {
    val media = Seq(
      (1L, scenePng(8, 8)), (2L, scenePng(8, 8, noise = 2)), // planted pair
      (3L, scenePng(40, 40)), (4L, scenePng(0, 40)),         // distinct
      (5L, Array[Byte](9, 9, 9)))                            // undecodable
      .toDF("media_id", "content")
    val pairs = Multimodal.imageNearDupPairs(media.repartition(3),
        col("media_id"), col("content"))
      .select("media_a", "media_b")
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  // ---- REAL Y4M video (round-13 verdict #9: the last multimodal fake,
  // closed for JDK-reachable formats) ----

  /** 64-frame Y4M clip whose frame f is bright (Y=200) iff bit f of
    * `mask` is set, else dark (Y=50) — the video twin of envelopeWav's
    * hash-identity fixture. `jitter` adds deterministic per-pixel luma
    * noise; `cs` picks the colorspace (chroma planes zeroed).
    */
  private def envelopeY4m(mask: Long, w: Int = 8, h: Int = 8,
      jitter: Int = 0, cs: String = "C420"): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 $cs\n".getBytes("US-ASCII"))
    val ySize = w * h
    val chroma = cs match {
      case "C444" => 2 * ySize
      case "Cmono" => 0
      case _ => 2 * ((w / 2) * (h / 2))
    }
    for (f <- 0 until 64) {
      bos.write("FRAME\n".getBytes("US-ASCII"))
      val base = if (((mask >> f) & 1L) == 1L) 200 else 50
      val y = Array.tabulate(ySize) { i =>
        val n = if (jitter > 0) (i * 31 + f * 7) % (2 * jitter + 1) - jitter
        else 0
        (base + n).toByte
      }
      bos.write(y)
      bos.write(new Array[Byte](chroma))
    }
    bos.toByteArray
  }

  test("REAL Y4M parse + decode: exact luminance histogram goldens, " +
    "all colorspaces, malformed None") {
    // 2 frames, 2×2 mono: Y values chosen to land in known buckets
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("YUV4MPEG2 W2 H2 F25:1 Cmono\n".getBytes("US-ASCII"))
    bos.write("FRAME\n".getBytes("US-ASCII"))
    bos.write(Array[Byte](0, 0, 64, 127))   // buckets 0,0,4,7 (dim 16)
    bos.write("FRAME\n".getBytes("US-ASCII"))
    bos.write(Array[Byte](-128, -1, 0, 0))  // 128→8, 255→15, 0, 0
    val hist = Multimodal.y4mDecode(bos.toByteArray, 16).get
    val expect = Array.fill(16)(0f)
    expect(0) = 4f / 8; expect(4) = 1f / 8; expect(7) = 1f / 8
    expect(8) = 1f / 8; expect(15) = 1f / 8
    assert(hist.toSeq === expect.toSeq)
    // colorspace framing: same Y content through C420/C444/Cmono
    // parses the same frame count and identical features
    val byCs = Seq("C420", "C444", "Cmono").map { cs =>
      Multimodal.y4mDecode(envelopeY4m(5L, cs = cs), 16).get.toSeq
    }
    assert(byCs.distinct.size === 1)
    // malformed payloads: None, never a throw
    assert(Multimodal.y4mParse(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.y4mParse(
      "YUV4MPEG2 W8 H8 C420\nFRAME\nshort".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.y4mParse(
      "YUV4MPEG2 W8 H8\n".getBytes("US-ASCII")).isEmpty, "zero frames")
  }

  test("Y4M round-15 sweep pins: FRAME lines carrying parameters " +
    "parse identically; overflow-scale W×H headers reject, no throw") {
    // the Y4M spec allows per-frame parameters after FRAME (e.g. the
    // Xlength extension): "FRAME X..." must frame exactly like a bare
    // "FRAME" — data starts after the newline either way
    val plain = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("YUV4MPEG2 W2 H2 F25:1 Cmono\n".getBytes("US-ASCII"))
      bos.write("FRAME\n".getBytes("US-ASCII"))
      bos.write(Array[Byte](10, 20, 30, 40))
      bos.write("FRAME\n".getBytes("US-ASCII"))
      bos.write(Array[Byte](50, 60, 70, 80))
      bos.toByteArray
    }
    val withParams = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("YUV4MPEG2 W2 H2 F25:1 Cmono\n".getBytes("US-ASCII"))
      bos.write("FRAME Xlength=4 I1\n".getBytes("US-ASCII"))
      bos.write(Array[Byte](10, 20, 30, 40))
      bos.write("FRAME X2\n".getBytes("US-ASCII"))
      bos.write(Array[Byte](50, 60, 70, 80))
      bos.toByteArray
    }
    val pPlain = Multimodal.y4mParse(plain).get
    val pParams = Multimodal.y4mParse(withParams).get
    assert(pPlain._1 === 2 && pPlain._2 === 2 && pPlain._3.size === 2)
    assert(pParams._1 === 2 && pParams._2 === 2 && pParams._3.size === 2)
    assert(Multimodal.y4mDecode(plain, 16).get.toSeq
      === Multimodal.y4mDecode(withParams, 16).get.toSeq,
      "parameterized FRAME lines must decode identically")
    // a frame line that is NOT a FRAME marker still rejects
    assert(Multimodal.y4mParse(
      "YUV4MPEG2 W2 H2 Cmono\nFRAMX\n1234".getBytes("US-ASCII")).isEmpty)
    // overflow-scale headers: W·H past 2³¹ (the old Int chroma product
    // wrapped here) must come back None — never a throw, never a
    // bogus acceptance with a sheared frame size
    for (cs <- Seq("C420", "C422", "C444", "Cmono")) {
      val huge = (s"YUV4MPEG2 W92682 H92682 $cs\nFRAME\n" + "x" * 64)
        .getBytes("US-ASCII")
      assert(Multimodal.y4mParse(huge).isEmpty, s"huge $cs must reject")
    }
    // Int.MaxValue-adjacent W alone (H tiny) keeps Long math honest
    assert(Multimodal.y4mParse(
      ("YUV4MPEG2 W2147483647 H2147483647 C420\nFRAME\nxx")
        .getBytes("US-ASCII")).isEmpty)
  }

  test("videoHash: temporal-envelope identity, noise-robust, " +
    "scene-sensitive, undecodable None") {
    val mask = 0x00ff00ff00ff00ffL
    val a = Multimodal.videoHash(envelopeY4m(mask)).get
    assert(a === mask, "bright frames above the clip mean set their bits")
    val noisy = Multimodal.videoHash(envelopeY4m(mask, jitter = 20)).get
    val other = Multimodal.videoHash(envelopeY4m(~mask)).get
    assert(java.lang.Long.bitCount(a ^ noisy) <= 3)
    assert(java.lang.Long.bitCount(a ^ other) > 3)
    assert(Multimodal.videoHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("videoNearDupPairs finds the planted noisy re-render only") {
    val mask = 0x0f0f0f0f0f0f0f0fL
    val media = Seq(
      (1L, envelopeY4m(mask)),
      (2L, envelopeY4m(mask, jitter = 15)), // noisy re-render
      (3L, envelopeY4m(~mask)))             // different material
      .toDF("media_id", "content")
    val pairs = Multimodal.videoNearDupPairs(media.repartition(2),
        col("media_id"), col("content"))
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("explodeFrames returns REAL evenly-spaced Y planes for y4m; " +
    "extractFeatures takes the real decode") {
    val clip = envelopeY4m(0xffffffff00000000L) // frames 0-31 dark, 32-63 bright
    val ds = Seq(MediaRow(7L, clip, MediaMeta("y4m", 8, 8, 1))).toDS()
    val frames = Multimodal.explodeFrames(ds, 4, 9999).collect().sortBy(_._2)
    assert(frames.length === 4)
    assert(frames.forall(_._3.length === 64), "a frame IS one 8×8 Y plane")
    // frames 0,16 dark (Y=50); 32,48 bright (Y=200)
    assert(frames.map(f => f._3.head & 0xff).toSeq === Seq(50, 50, 200, 200))
    // extractFeatures uses the real decode: the container bytes' fake
    // histogram would put mass in the header/marker buckets
    val feats = Multimodal.extractFeatures(ds, featureDim = 16)
      .collect().head.features.toSeq
    assert(feats === Multimodal.y4mDecode(clip, 16).get.toSeq)
  }
}
