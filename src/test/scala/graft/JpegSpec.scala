package graft

import graft.operators.{Jpeg, Png}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM baseline JPEG codec spec.
  *
  * Three layers of truth:
  *   1. decode∘encode equals an INDEPENDENT pixel→pixel replica of the
  *      pinned DCT/quant/subsample contract (no entropy coding, no
  *      markers) — exact equality, every geometry/quality/sampling/
  *      restart combination. Agreement proves the Huffman + marker layer
  *      is the identity on quantized coefficients.
  *   2. INTEROP with a foreign implementation (the JDK's ImageIO JPEG
  *      plugin, a libjpeg lineage codec): our decoder reads its streams
  *      and its decoder reads ours, with only IDCT-rounding-scale
  *      differences.
  *   3. Loud rejection of the formats we do not implement (progressive,
  *      arithmetic, 12-bit, sampling factors > 2) and of corrupt data.
  */
class JpegSpec extends AnyFunSuite {

  private def planted(w: Int, h: Int, ch: Int, seed: Long = 7L): Array[Byte] =
    Array.tabulate(w * h * ch) { i =>
      var z = seed * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
      z ^= (z >>> 31); z *= 0x94D049BB133111EBL
      ((z >>> 40) & 0xff).toByte
    }

  // ── the independent replica (pinned contract, functional style) ──────

  private val zig = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
  private val baseL = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)
  private val baseC = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  /** Pure pixel→pixel replica of decode∘encode per Jpeg.scala's pinned
    * determinism contract — color convert, optional 4:2:0, MCU-grid
    * padding, FDCT/quant/dequant/IDCT per block, replication upsample,
    * color convert back. Never touches Huffman coding or markers.
    */
  private def roundTripRef(w: Int, h: Int, ch: Int, px: Array[Byte],
                           quality: Int, subsample: Boolean): Array[Byte] = {
    def clamp(v: Int) = math.max(0, math.min(255, v))
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    def qt(base: Array[Int]) =
      base.map(b => math.max(1, math.min(255, (b * scale + 50) / 100)))
    val qL = qt(baseL); val qC = qt(baseC)
    val n = w * h
    val (yP, cbP, crP) =
      if (ch == 1) (Array.tabulate(n)(i => px(i) & 0xff),
        Array.empty[Int], Array.empty[Int])
      else {
        val yy = new Array[Int](n); val cb = new Array[Int](n); val cr = new Array[Int](n)
        for (i <- 0 until n) {
          val r = px(i * 3) & 0xff; val g = px(i * 3 + 1) & 0xff; val b = px(i * 3 + 2) & 0xff
          yy(i) = clamp(math.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5).toInt)
          cb(i) = clamp(math.floor(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5).toInt)
          cr(i) = clamp(math.floor(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5).toInt)
        }
        (yy, cb, cr)
      }
    val sub = subsample && ch == 3
    def down(src: Array[Int]): (Array[Int], Int, Int) = {
      val cw = (w + 1) / 2; val chh = (h + 1) / 2
      (Array.tabulate(cw * chh) { k =>
        val cx = k % cw; val cy = k / cw
        val x0 = 2 * cx; val x1 = math.min(2 * cx + 1, w - 1)
        val y0 = 2 * cy; val y1 = math.min(2 * cy + 1, h - 1)
        (src(y0 * w + x0) + src(y0 * w + x1) +
          src(y1 * w + x0) + src(y1 * w + x1) + 2) / 4
      }, cw, chh)
    }
    // (plane, pw, ph, hf, vf, quant)
    val comps: Seq[(Array[Int], Int, Int, Int, Int, Array[Int])] =
      if (ch == 1) Seq((yP, w, h, 1, 1, qL))
      else if (!sub) Seq((yP, w, h, 1, 1, qL), (cbP, w, h, 1, 1, qC), (crP, w, h, 1, 1, qC))
      else {
        val (cb, cw, chh) = down(cbP); val (cr, _, _) = down(crP)
        Seq((yP, w, h, 2, 2, qL), (cb, cw, chh, 1, 1, qC), (cr, cw, chh, 1, 1, qC))
      }
    val hMax = comps.map(_._4).max; val vMax = comps.map(_._5).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val outPlanes = comps.map { case (plane, pw, ph, hf, vf, q) =>
      val padW = mcusX * hf * 8; val padH = mcusY * vf * 8
      val out = new Array[Int](padW * padH)
      for (bR <- 0 until padH / 8; bC <- 0 until padW / 8) {
        val coefs = Array.tabulate(64) { k =>
          val v = k / 8; val u = k % 8
          var sum = 0.0
          for (y <- 0 until 8) {
            val cy = math.cos((2 * y + 1) * v * math.Pi / 16)
            for (x <- 0 until 8) {
              val s = plane(math.min(bR * 8 + y, ph - 1) * pw +
                math.min(bC * 8 + x, pw - 1)) - 128
              sum += s * cy * math.cos((2 * x + 1) * u * math.Pi / 16)
            }
          }
          val au = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
          val av = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
          val c = 0.25 * au * av * sum
          math.floor(c / q(k) + 0.5).toInt
        }
        for (y <- 0 until 8; x <- 0 until 8) {
          var sum = 0.0
          for (v <- 0 until 8) {
            val cy = math.cos((2 * y + 1) * v * math.Pi / 16)
            for (u <- 0 until 8) {
              val au = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
              val av = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
              val dq = coefs(v * 8 + u).toDouble * q(v * 8 + u)
              sum += 0.25 * au * av * dq * math.cos((2 * x + 1) * u * math.Pi / 16) * cy
            }
          }
          out((bR * 8 + y) * padW + bC * 8 + x) = clamp(math.floor(sum + 128.5).toInt)
        }
      }
      (out, padW, hf, vf)
    }
    val outPx = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w) {
      if (ch == 1) outPx(y * w + x) =
        outPlanes(0)._1(y * outPlanes(0)._2 + x).toByte
      else {
        def samp(ci: Int): Int = {
          val (pl, padW, hf, vf) = outPlanes(ci)
          pl((y * vf / vMax) * padW + (x * hf / hMax))
        }
        val yv = samp(0); val cb = samp(1); val cr = samp(2)
        val o = (y * w + x) * 3
        outPx(o) = clamp(math.floor(yv + 1.402 * (cr - 128) + 0.5).toInt).toByte
        outPx(o + 1) = clamp(math.floor(
          yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5).toInt).toByte
        outPx(o + 2) = clamp(math.floor(yv + 1.772 * (cb - 128) + 0.5).toInt).toByte
      }
    }
    outPx
  }

  // ── layer 1: exact equality with the replica ─────────────────────────

  test("decode∘encode equals the pixel replica on every geometry/quality/sampling") {
    val dims = Seq((4, 3), (8, 8), (9, 7), (16, 16), (17, 9), (32, 25))
    for {
      (w, h) <- dims
      ch <- Seq(1, 3)
      sub <- Seq(false, true)
      quality <- Seq(35, 50, 75, 95)
    } {
      val px = planted(w, h, ch, seed = w * 1000 + h * 10 + ch + quality)
      val enc = Jpeg.encode(w, h, ch, px, quality, subsample = sub)
      val dec = Jpeg.decode(enc)
      assert(dec.width === w && dec.height === h && dec.channels === ch)
      val ref = roundTripRef(w, h, ch, px, quality, sub)
      assert(dec.pixels.toSeq === ref.toSeq,
        s"w=$w h=$h ch=$ch sub=$sub q=$quality")
    }
  }

  test("restart intervals: RST markers appear on the wire and change nothing") {
    val (w, h) = (33, 18) // 3x2 MCUs at 4:2:0 → interval 2 restarts twice
    val px = planted(w, h, 3, seed = 99L)
    for (sub <- Seq(false, true); interval <- Seq(1, 2, 3)) {
      val plain = Jpeg.encode(w, h, 3, px, 75, subsample = sub)
      val rst = Jpeg.encode(w, h, 3, px, 75, subsample = sub, restartMcus = interval)
      // a DRI segment and at least one RST0 marker are on the wire
      assert(rst.length > plain.length)
      val hasRst0 = rst.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd0)
      assert(hasRst0, s"no RST0 marker at interval $interval sub=$sub")
      assert(Jpeg.decode(rst).pixels.toSeq === Jpeg.decode(plain).pixels.toSeq)
    }
  }

  test("quality orders reconstruction error; identity regions survive") {
    // smooth gradient: JPEG's favorable case — q95 must beat q35 clearly
    val (w, h) = (32, 32)
    val px = Array.tabulate(w * h)(i => ((i % w) * 4 + (i / w) * 3).toByte)
    def mae(q: Int): Double = {
      val dec = Jpeg.decode(Jpeg.encode(w, h, 1, px, q))
      px.indices.map(i => math.abs((dec.pixels(i) & 0xff) - (px(i) & 0xff))).sum.toDouble / px.length
    }
    val e95 = mae(95); val e35 = mae(35)
    assert(e95 < e35, s"q95 MAE $e95 not below q35 MAE $e35")
    assert(e95 < 2.0, s"q95 MAE $e95 too large for a smooth gradient")
    // a flat 128 image is exact at ANY quality (level-shifted DC = 0, all
    // coefficients 0); other flat values are exact only when the DC
    // quantizer divides 8·(v−128) — e.g. 77 (DC −408) at q75 (qDC = 8)
    // and q95 (qDC = 2) but NOT q35 (qDC = 23 → 77 decodes as 76)
    val mid = Array.fill(16 * 16)(128.toByte)
    for (q <- Seq(35, 75, 95))
      assert(Jpeg.decode(Jpeg.encode(16, 16, 1, mid, q)).pixels.toSeq === mid.toSeq)
    val flat = Array.fill(16 * 16)(77.toByte)
    for (q <- Seq(75, 95))
      assert(Jpeg.decode(Jpeg.encode(16, 16, 1, flat, q)).pixels.toSeq === flat.toSeq)
    assert(Jpeg.decode(Jpeg.encode(16, 16, 1, flat, 35)).pixels.forall(_ == 76.toByte))
  }

  // ── layer 2: foreign-implementation interop (JDK ImageIO) ────────────

  private def imageIoEncodeGray(w: Int, h: Int, px: Array[Byte],
                                progressive: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x) & 0xff)
    imageIoWrite(img, progressive)
  }

  private def imageIoWrite(img: java.awt.image.BufferedImage,
                           progressive: Boolean): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    if (progressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream()
    writer.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(baos))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose()
    baos.toByteArray
  }

  private def imageIoDecode(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(img != null, "ImageIO could not parse the payload")
    val w = img.getWidth; val h = img.getHeight
    // normalize to gray via the raster's first band (gray images) —
    // callers only use this for single-component streams
    val out = Array.tabulate(w * h)(i => img.getRaster.getSample(i % w, i / w, 0))
    (w, h, out)
  }

  test("interop: our decoder reads ImageIO (libjpeg-lineage) streams") {
    // smooth content, so codec differences are IDCT-rounding scale only
    val (w, h) = (40, 27)
    val px = Array.tabulate(w * h)(i => ((i % w) * 5 + (i / w) * 2).toByte)
    val foreign = imageIoEncodeGray(w, h, px)
    val mine = Jpeg.decode(foreign)
    assert(mine.width === w && mine.height === h && mine.channels === 1)
    val (fw, fh, theirs) = imageIoDecode(foreign)
    assert(fw === w && fh === h)
    val diffs = (0 until w * h).map(i => math.abs((mine.pixels(i) & 0xff) - theirs(i)))
    assert(diffs.max <= 2,
      s"max decode divergence ${diffs.max} vs the foreign decoder on its own stream")
  }

  test("interop: ImageIO decodes our streams (gray and 4:4:4 color)") {
    val (w, h) = (24, 19)
    val gpx = Array.tabulate(w * h)(i => ((i % w) * 7 + (i / w) * 4).toByte)
    val (gw, gh, gdec) = imageIoDecode(Jpeg.encode(w, h, 1, gpx, 90))
    assert(gw === w && gh === h)
    val mineG = Jpeg.decode(Jpeg.encode(w, h, 1, gpx, 90))
    val gDiffs = (0 until w * h).map(i => math.abs((mineG.pixels(i) & 0xff) - gdec(i)))
    assert(gDiffs.max <= 2, s"gray: foreign decoder diverges by ${gDiffs.max}")

    // color 4:4:4 (no subsampling → no upsample-filter differences);
    // smooth channels keep the color-convert rounding gap small
    val cpx = Array.tabulate(w * h * 3) { k =>
      val i = k / 3
      (((i % w) * 6 + (i / w) * 3 + (k % 3) * 20) % 256).toByte
    }
    val enc = Jpeg.encode(w, h, 3, cpx, 90)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(img != null && img.getWidth === w && img.getHeight === h)
    val mineC = Jpeg.decode(enc)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val o = (y * w + x) * 3
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - (mineC.pixels(o) & 0xff)))
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - (mineC.pixels(o + 1) & 0xff)))
      maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - (mineC.pixels(o + 2) & 0xff)))
    }
    assert(maxDiff <= 3, s"color: foreign decoder diverges by $maxDiff")
  }

  // ── layer 3: loud rejection ───────────────────────────────────────────

  private def flipMarker(payload: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = payload.clone()
    val at = out.indices.dropRight(1).find(i =>
      (out(i) & 0xff) == 0xff && (out(i + 1) & 0xff) == from).get
    out(at + 1) = to.toByte
    out
  }

  test("progressive interop: our decoder reads ImageIO's SOF2 streams " +
    "(spectral selection + successive approximation, gray and 4:2:0 color)") {
    val (w, h) = (40, 27)
    val px = Array.tabulate(w * h)(i => ((i % w) * 5 + (i / w) * 2).toByte)
    val foreign = imageIoEncodeGray(w, h, px, progressive = true)
    // really progressive: an SOF2 marker is on the wire, and >1 SOS
    assert(foreign.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2))
    assert(foreign.sliding(2).count(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda) > 1)
    val mine = Jpeg.decode(foreign)
    assert(mine.width === w && mine.height === h && mine.channels === 1)
    val (fw, fh, theirs) = imageIoDecode(foreign)
    assert(fw === w && fh === h)
    val diffs = (0 until w * h).map(i => math.abs((mine.pixels(i) & 0xff) - theirs(i)))
    assert(diffs.max <= 2,
      s"max progressive-decode divergence ${diffs.max} vs the foreign decoder")
    // the progressive stream reconstructs the SAME image its baseline
    // sibling does (coefficients identical, only scan order differs)
    val baseline = imageIoEncodeGray(w, h, px, progressive = false)
    val mineBase = Jpeg.decode(baseline)
    val crossDiffs = (0 until w * h).map(i =>
      math.abs((mine.pixels(i) & 0xff) - (mineBase.pixels(i) & 0xff)))
    assert(crossDiffs.max <= 2, s"progressive vs baseline drift ${crossDiffs.max}")

    // color: ImageIO's progressive default is 4:2:0 with a 10-scan script;
    // smooth content keeps the upsample-filter gap (their triangle filter
    // vs our replication) bounded
    val cimg = new java.awt.image.BufferedImage(33, 18,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 18; x <- 0 until 33)
      cimg.setRGB(x, y, (((x * 5 + 40) & 0xff) << 16) |
        (((y * 7 + 30) & 0xff) << 8) | ((x * 2 + y * 3 + 20) & 0xff))
    val cforeign = imageIoWrite(cimg, progressive = true)
    val cmine = Jpeg.decode(cforeign)
    assert(cmine.width === 33 && cmine.height === 18 && cmine.channels === 3)
    var maxDiff = 0; var sumDiff = 0L
    for (y <- 0 until 18; x <- 0 until 33) {
      val rgb = cimg.getRGB(x, y)
      val o = (y * 33 + x) * 3
      val ds = Seq(
        math.abs(((rgb >> 16) & 0xff) - (cmine.pixels(o) & 0xff)),
        math.abs(((rgb >> 8) & 0xff) - (cmine.pixels(o + 1) & 0xff)),
        math.abs((rgb & 0xff) - (cmine.pixels(o + 2) & 0xff)))
      maxDiff = math.max(maxDiff, ds.max); sumDiff += ds.sum
    }
    val meanDiff = sumDiff.toDouble / (33 * 18 * 3)
    info(f"progressive color vs source: max=$maxDiff mean=$meanDiff%.2f")
    assert(meanDiff <= 3.0, s"mean color error $meanDiff vs the source image")
    assert(maxDiff <= 16, s"max color error $maxDiff vs the source image")
  }

  test("EXIF orientation: APP1 round trip for all eight codes, absent " +
    "tag defaults upright, and the transform algebra holds") {
    import graft.operators.Multimodal.orientImage
    val px = planted(9, 7, 3)
    val plain = Jpeg.encode(9, 7, 3, px, 80)
    for (o <- 1 to 8) {
      val enc = Jpeg.encode(9, 7, 3, px, 80, exifOrientation = o)
      assert(Jpeg.exifOrientation(enc) === o)
      // APP1 is metadata: the pixels decode identically
      assert(Jpeg.decode(enc).pixels.toSeq === Jpeg.decode(plain).pixels.toSeq)
    }
    assert(Jpeg.exifOrientation(plain) === 1, "no APP1 → upright")
    assert(Jpeg.exifOrientation(
      imageIoEncodeGray(8, 8, planted(8, 8, 1))) === 1, "JFIF-only stream → upright")
    // hand-checked 2x2 cases: rotate-90-CW and transpose
    val t = Png.Image(2, 2, 1, Array[Byte](1, 2, 3, 4))
    assert(orientImage(t, 6).pixels.toSeq === Seq[Byte](3, 1, 4, 2))
    assert(orientImage(t, 5).pixels.toSeq === Seq[Byte](1, 3, 2, 4))
    assert(orientImage(t, 3).pixels.toSeq === Seq[Byte](4, 3, 2, 1))
    // algebra on a non-square image with distinct pixels: 2/3/4/5/7 are
    // involutions, 6∘8 is the identity, and dims swap for 5-8
    val img = Png.Image(5, 3, 1, Array.tabulate(15)(_.toByte))
    for (o <- Seq(2, 3, 4, 5, 7))
      assert(orientImage(orientImage(img, o), o).pixels.toSeq === img.pixels.toSeq, s"o=$o")
    assert(orientImage(orientImage(img, 6), 8).pixels.toSeq === img.pixels.toSeq)
    assert(orientImage(img, 6).width === 3 && orientImage(img, 6).height === 5)
    intercept[IllegalArgumentException](orientImage(img, 9))
  }

  test("unsupported formats and corruption reject by name") {
    val good = Jpeg.encode(16, 12, 3, planted(16, 12, 3), 75)
    // lossless / arithmetic SOF markers
    val lossless = intercept[IllegalArgumentException](
      Jpeg.decode(flipMarker(good, 0xc0, 0xc3)))
    assert(lossless.getMessage.contains("lossless"))
    val arith = intercept[IllegalArgumentException](
      Jpeg.decode(flipMarker(good, 0xc0, 0xc9)))
    assert(arith.getMessage.contains("arithmetic"))
    // not a JPEG at all
    intercept[IllegalArgumentException](Jpeg.decode("plainly not jpeg".getBytes))
    // truncated entropy data
    intercept[IllegalArgumentException](Jpeg.decode(good.take(good.length - 10)))
    // 12-bit precision (SOF0 precision byte)
    val deep = good.clone()
    val sofAt = deep.indices.dropRight(1).find(i =>
      (deep(i) & 0xff) == 0xff && (deep(i + 1) & 0xff) == 0xc0).get
    deep(sofAt + 4) = 12.toByte
    val deepEx = intercept[IllegalArgumentException](Jpeg.decode(deep))
    assert(deepEx.getMessage.contains("8-bit"))
    // sampling factor 3 (outside the 1..2 grid)
    val samp = good.clone()
    samp(sofAt + 11) = 0x33.toByte // component 1's h<<4|v byte
    val sampEx = intercept[IllegalArgumentException](Jpeg.decode(samp))
    assert(sampEx.getMessage.contains("sampling"))
    // encoder-side validation
    intercept[IllegalArgumentException](Jpeg.encode(4, 4, 2, new Array[Byte](32)))
    intercept[IllegalArgumentException](Jpeg.encode(4, 4, 1, new Array[Byte](16), 0))
    intercept[IllegalArgumentException](Jpeg.encode(4, 4, 1, new Array[Byte](15)))
  }
}
