package graft.operators

/** Pure-JVM baseline JPEG codec — no image library, just the public ITU
  * T.81 spec (baseline sequential DCT, the format of essentially every
  * crawled photo). This closes the last image-container gap: the PNG tier
  * went stub-free in r14, but a real crawl is mostly JPEG, and a payload
  * sniffing `FF D8` used to reject. Like [[Png]], the encoder exists to
  * plant REAL containers for fixtures and re-encode pipeline output; the
  * decoder is the production path.
  *
  * Scope: 8-bit baseline (SOF0) encode+decode and PROGRESSIVE (SOF2)
  * decode (spectral selection + successive approximation per T.81 §G —
  * most large web JPEGs are progressive), grayscale and YCbCr with
  * sampling factors 1 or 2 per axis (covers 4:4:4 / 4:2:2 / 4:2:0 /
  * 4:4:0), restart intervals (DRI + RST0-7), multi-table DQT/DHT
  * segments, 8- and 16-bit quant table precision, fill bytes, APPn/COM
  * skip. Arithmetic coding (SOF9+), lossless, hierarchical and 12-bit
  * reject loudly by name — a silent partial decode would poison every
  * downstream feature.
  *
  * DETERMINISM CONTRACT (the fixture-replica spec — Verify re-derives
  * decode∘encode as a pure pixel→pixel function with no entropy coding,
  * so oracle agreement proves the Huffman/marker round trip is the
  * identity on quantized coefficients, exactly as the PNG fixtures prove
  * DEFLATE+filters):
  *   - RGB→YCbCr (JFIF):  Y = ⌊0.299·r + 0.587·g + 0.114·b + 0.5⌋,
  *     Cb = ⌊128.0 − 0.168736·r − 0.331264·g + 0.5·b + 0.5⌋,
  *     Cr = ⌊128.0 + 0.5·r − 0.418688·g − 0.081312·b + 0.5⌋, clamp 0..255;
  *     each sum accumulates LEFT-TO-RIGHT in doubles.
  *   - 4:2:0 chroma downsample: c(cx,cy) = (c00 + c01 + c10 + c11 + 2) / 4
  *     integer, right/bottom edges replicate.
  *   - Planes pad to the MCU grid by edge replication (sample at
  *     (min(y, ph−1), min(x, pw−1))).
  *   - FDCT per 8×8 block of (sample − 128):
  *     C(v,u) = 0.25·α(u)·α(v) · Σ_{y=0..7} Σ_{x=0..7}
  *       s(y,x)·cos((2x+1)uπ/16)·cos((2y+1)vπ/16), α(0)=1/√2 else 1;
  *     y outer / x inner ascending, inner product written
  *     `s(y,x) * cosY * cosX` left-to-right, the α scale applied LAST as
  *     `0.25 * αu * αv * sum` left-to-right; cosine argument written
  *     `(2t+1) * f * π / 16` left-to-right.
  *   - Quantize: ⌊C/q + 0.5⌋ (round half toward +∞, both signs) with q
  *     from the Annex-K base tables under IJG quality scaling:
  *     scale = q<50 ? 5000/q : 200−2q (integer), entry =
  *     clamp((base·scale + 50)/100, 1, 255).
  *   - Dequantize exact (int·int in double), IDCT with v outer / u inner
  *     ascending, term `0.25 * αu * αv * C(v,u) * cosX * cosY`
  *     left-to-right; sample = ⌊sum + 128.5⌋ clamp 0..255.
  *   - Chroma upsample by replication: component sample at
  *     (x·h_i/Hmax, y·v_i/Vmax), integer division.
  *   - YCbCr→RGB: r = ⌊y + 1.402·(cr−128) + 0.5⌋,
  *     g = ⌊y − 0.344136·(cb−128) − 0.714136·(cr−128) + 0.5⌋,
  *     b = ⌊y + 1.772·(cb−128) + 0.5⌋, clamp 0..255.
  *
  * Reference behavior being matched: the reference stores media as opaque
  * blobs (serializers/BytesSerializer.java); decode is a pipeline
  * extension per the brief, wire format from the public T.81/JFIF specs.
  */
object Jpeg {

  // ── public constants from ITU T.81 Annex K ───────────────────────────

  /** Zigzag scan: position k in the scan → row-major index v·8+u. */
  private[operators] val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance base quantization table (row-major). */
  private[operators] val stdLumaQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance base quantization table (row-major). */
  private[operators] val stdChromaQ: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K.3-K.6 Huffman specs: (codes-per-length 1..16, values).
  private val dcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcLumaVals = (0 to 11).toArray
  private val dcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val dcChromaVals = (0 to 11).toArray
  private val acLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val acChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val acChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** IJG quality scaling of an Annex-K base table (the de-facto public
    * convention): quality 1..100, 50 = the base table verbatim.
    */
  def quantTable(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"Jpeg: quality $quality out of 1..100")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(b => math.max(1, math.min(255, (b * scale + 50) / 100)))
  }

  // pinned cosine: cos((2t+1)·f·π/16), argument evaluated left-to-right
  private val cosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((f, t) => math.cos((2 * t + 1) * f * math.Pi / 16))
  private val invSqrt2 = 1.0 / math.sqrt(2.0)

  /** Pinned FDCT + quantize of one 8×8 block of level-shifted samples
    * (row-major ints, already −128): output is the 64 quantized
    * coefficients in ROW-MAJOR (v·8+u) order.
    */
  private[operators] def fdctQuant(blk: Array[Int], q: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var sum = 0.0
        var y = 0
        while (y < 8) {
          val cy = cosT(v)(y)
          var x = 0
          while (x < 8) {
            sum += blk(y * 8 + x) * cy * cosT(u)(x)
            x += 1
          }
          y += 1
        }
        val au = if (u == 0) invSqrt2 else 1.0
        val av = if (v == 0) invSqrt2 else 1.0
        val c = 0.25 * au * av * sum
        out(v * 8 + u) = math.floor(c / q(v * 8 + u) + 0.5).toInt
        u += 1
      }
      v += 1
    }
    out
  }

  /** Pinned dequantize + IDCT: quantized row-major coefficients → 8×8
    * clamped 0..255 samples (row-major).
    */
  private[operators] def dequantIdct(coef: Array[Int], q: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          val cy = cosT(v)(y)
          var u = 0
          while (u < 8) {
            val au = if (u == 0) invSqrt2 else 1.0
            val av = if (v == 0) invSqrt2 else 1.0
            val dq = coef(v * 8 + u).toDouble * q(v * 8 + u)
            sum += 0.25 * au * av * dq * cosT(u)(x) * cy
            u += 1
          }
          v += 1
        }
        val s = math.floor(sum + 128.5).toInt
        out(y * 8 + x) = math.max(0, math.min(255, s))
        x += 1
      }
      y += 1
    }
    out
  }

  // ── Huffman machinery (T.81 C.2 code assignment) ─────────────────────

  /** (value → (code, length)) encode table from a BITS/HUFFVAL spec. */
  private def encTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        table(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    table
  }

  /** ((length, code) → value) decode map from a BITS/HUFFVAL spec. */
  private def decTable(bits: Array[Int], vals: Array[Int]): Map[(Int, Int), Int] = {
    val m = Map.newBuilder[(Int, Int), Int]
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        m += ((len, code) -> vals(k))
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    m.result()
  }

  /** Magnitude category (SSSS): number of bits of |v|, 0 for v = 0. */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the open byte with 1 bits (T.81 F.1.2.3) and flush. */
    def align(): Unit =
      if (nbits > 0) put(0xff, 8 - nbits)
  }

  // ── encoder ──────────────────────────────────────────────────────────

  private def writeSeg(out: java.io.ByteArrayOutputStream, marker: Int,
                       body: Array[Int]): Unit = {
    out.write(0xff); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    body.foreach(b => out.write(b & 0xff))
  }

  /** Baseline encoder. `channels` 1 (grayscale, one component) or 3 (RGB
    * in, JFIF YCbCr on the wire). `subsample` selects 4:2:0 (ignored for
    * grayscale); `restartMcus` > 0 emits DRI + RST markers every that
    * many MCUs. Output layout: SOI, APP0(JFIF), DQT(both tables packed in
    * one segment), SOF0, DHT(all four tables in one segment), [DRI], SOS,
    * entropy data, EOI.
    */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
             quality: Int = 75, subsample: Boolean = false,
             restartMcus: Int = 0, exifOrientation: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"Jpeg.encode: bad dims ${width}x$height")
    require(channels == 1 || channels == 3,
      s"Jpeg.encode: unsupported channel count $channels (1 = gray, 3 = RGB)")
    require(pixels.length == width * height * channels,
      s"Jpeg.encode: expected ${width * height * channels} samples, got ${pixels.length}")
    require(restartMcus >= 0, s"Jpeg.encode: bad restart interval $restartMcus")
    val qLuma = quantTable(stdLumaQ, quality)
    val qChroma = quantTable(stdChromaQ, quality)

    def clamp255(v: Int) = math.max(0, math.min(255, v))
    // color convert into per-component planes (full resolution)
    val n = width * height
    val yPlane = new Array[Int](n)
    val cbPlane = if (channels == 3) new Array[Int](n) else null
    val crPlane = if (channels == 3) new Array[Int](n) else null
    var i = 0
    while (i < n) {
      if (channels == 1) yPlane(i) = pixels(i) & 0xff
      else {
        val r = pixels(i * 3) & 0xff
        val g = pixels(i * 3 + 1) & 0xff
        val b = pixels(i * 3 + 2) & 0xff
        yPlane(i) = clamp255(math.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5).toInt)
        cbPlane(i) = clamp255(math.floor(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5).toInt)
        crPlane(i) = clamp255(math.floor(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5).toInt)
      }
      i += 1
    }

    val sub = subsample && channels == 3
    // component geometry: (plane, planeW, planeH, hFac, vFac, quant, isLuma)
    case class Comp(plane: Array[Int], pw: Int, ph: Int, hf: Int, vf: Int,
                    q: Array[Int], luma: Boolean)
    def downsample(src: Array[Int]): (Array[Int], Int, Int) = {
      val cw = (width + 1) / 2; val chh = (height + 1) / 2
      val out = new Array[Int](cw * chh)
      var cy = 0
      while (cy < chh) {
        var cx = 0
        while (cx < cw) {
          val x0 = 2 * cx; val x1 = math.min(2 * cx + 1, width - 1)
          val y0 = 2 * cy; val y1 = math.min(2 * cy + 1, height - 1)
          out(cy * cw + cx) =
            (src(y0 * width + x0) + src(y0 * width + x1) +
              src(y1 * width + x0) + src(y1 * width + x1) + 2) / 4
          cx += 1
        }
        cy += 1
      }
      (out, cw, chh)
    }
    val comps: Seq[Comp] =
      if (channels == 1) Seq(Comp(yPlane, width, height, 1, 1, qLuma, luma = true))
      else if (!sub) Seq(
        Comp(yPlane, width, height, 1, 1, qLuma, luma = true),
        Comp(cbPlane, width, height, 1, 1, qChroma, luma = false),
        Comp(crPlane, width, height, 1, 1, qChroma, luma = false))
      else {
        val (cb, cw, chh) = downsample(cbPlane)
        val (cr, _, _) = downsample(crPlane)
        Seq(Comp(yPlane, width, height, 2, 2, qLuma, luma = true),
          Comp(cb, cw, chh, 1, 1, qChroma, luma = false),
          Comp(cr, cw, chh, 1, 1, qChroma, luma = false))
      }
    val hMax = comps.map(_.hf).max
    val vMax = comps.map(_.vf).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)

    val out = new java.io.ByteArrayOutputStream(4096)
    out.write(0xff); out.write(0xd8) // SOI
    // APP0 / JFIF 1.01, no thumbnail
    writeSeg(out, 0xe0,
      Array(0x4a, 0x46, 0x49, 0x46, 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    if (exifOrientation != 0) writeSeg(out, 0xe1, exifApp1(exifOrientation))
    // DQT: both tables in one segment (Pq=0 8-bit), zigzag order on the wire
    val dqt = Array(0) ++ zigzag.map(i => qLuma(i)) ++
      (if (channels == 3) Array(1) ++ zigzag.map(i => qChroma(i))
       else Array.empty[Int])
    writeSeg(out, 0xdb, dqt)
    // SOF0: precision 8; component ids 1..3, sampling h<<4|v, quant id
    val sof = Array(8, (height >> 8) & 0xff, height & 0xff,
      (width >> 8) & 0xff, width & 0xff, channels) ++
      comps.zipWithIndex.flatMap { case (c, ci) =>
        Array(ci + 1, (c.hf << 4) | c.vf, if (c.luma) 0 else 1)
      }
    writeSeg(out, 0xc0, sof)
    // DHT: all needed tables in one segment (class<<4 | id)
    def dhtBody(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]) =
      Array((cls << 4) | id) ++ bits ++ vals
    val dht = dhtBody(0, 0, dcLumaBits, dcLumaVals) ++
      dhtBody(1, 0, acLumaBits, acLumaVals) ++
      (if (channels == 3)
        dhtBody(0, 1, dcChromaBits, dcChromaVals) ++
          dhtBody(1, 1, acChromaBits, acChromaVals)
      else Array.empty[Int])
    writeSeg(out, 0xc4, dht)
    if (restartMcus > 0)
      writeSeg(out, 0xdd, Array((restartMcus >> 8) & 0xff, restartMcus & 0xff))
    // SOS: per component DC/AC table ids, spectral selection 0..63
    val sos = Array(channels) ++
      comps.zipWithIndex.flatMap { case (c, ci) =>
        Array(ci + 1, if (c.luma) 0x00 else 0x11)
      } ++ Array(0, 63, 0)
    writeSeg(out, 0xda, sos)

    val dcLumaEnc = encTable(dcLumaBits, dcLumaVals)
    val acLumaEnc = encTable(acLumaBits, acLumaVals)
    val dcChromaEnc = encTable(dcChromaBits, dcChromaVals)
    val acChromaEnc = encTable(acChromaBits, acChromaVals)
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](comps.size)

    def encodeBlock(c: Comp, ci: Int, bRow: Int, bCol: Int): Unit = {
      val blk = new Array[Int](64)
      var y = 0
      while (y < 8) {
        val sy = math.min(bRow * 8 + y, c.ph - 1)
        var x = 0
        while (x < 8) {
          val sx = math.min(bCol * 8 + x, c.pw - 1)
          blk(y * 8 + x) = c.plane(sy * c.pw + sx) - 128
          x += 1
        }
        y += 1
      }
      val coef = fdctQuant(blk, c.q)
      val (dcT, acT) = if (c.luma) (dcLumaEnc, acLumaEnc) else (dcChromaEnc, acChromaEnc)
      // DC: category-coded difference from the component predictor
      val diff = coef(0) - dcPred(ci)
      dcPred(ci) = coef(0)
      val s = category(diff)
      // baseline DC categories stop at 11 / AC at 10; reachable only via
      // adversarial alternating ±128 blocks quantized at 1 — reject
      // loudly rather than emit a stream no decoder can parse
      require(s <= 11, s"Jpeg.encode: DC difference $diff out of baseline range")
      val (dcCode, dcLen) = dcT(s)
      bw.put(dcCode, dcLen)
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC: run-length over the zigzag scan, ZRL for 16 zeros, EOB
      var run = 0
      var k = 1
      while (k < 64) {
        val v = coef(zigzag(k))
        if (v == 0) run += 1
        else {
          while (run >= 16) {
            val (c0, l0) = acT(0xf0); bw.put(c0, l0); run -= 16
          }
          val ss = category(v)
          require(ss <= 10, s"Jpeg.encode: AC coefficient $v out of baseline range")
          val (c1, l1) = acT((run << 4) | ss)
          bw.put(c1, l1)
          bw.put(if (v < 0) v + (1 << ss) - 1 else v, ss)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (c2, l2) = acT(0x00); bw.put(c2, l2) }
    }

    var mcu = 0
    val totalMcus = mcusX * mcusY
    var rstIdx = 0
    while (mcu < totalMcus) {
      if (restartMcus > 0 && mcu > 0 && mcu % restartMcus == 0) {
        bw.align()
        out.write(0xff); out.write(0xd0 + (rstIdx % 8))
        rstIdx += 1
        java.util.Arrays.fill(dcPred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      comps.zipWithIndex.foreach { case (c, ci) =>
        var v = 0
        while (v < c.vf) {
          var h = 0
          while (h < c.hf) {
            encodeBlock(c, ci, my * c.vf + v, mx * c.hf + h)
            h += 1
          }
          v += 1
        }
      }
      mcu += 1
    }
    bw.align()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ── decoder ──────────────────────────────────────────────────────────

  private val sofNames = Map(
    0xc1 -> "extended sequential", 0xc3 -> "lossless",
    0xc5 -> "differential sequential", 0xc6 -> "differential progressive",
    0xc7 -> "differential lossless", 0xc9 -> "arithmetic sequential",
    0xca -> "arithmetic progressive", 0xcb -> "arithmetic lossless",
    0xcd -> "differential arithmetic sequential",
    0xce -> "differential arithmetic progressive",
    0xcf -> "differential arithmetic lossless")

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    /** Next entropy bit; 0xFF00 unstuffs; hitting a real marker throws. */
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < data.length, "Jpeg.decode: entropy data truncated")
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < data.length, "Jpeg.decode: entropy data truncated at 0xFF")
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed
          else throw new IllegalArgumentException(
            f"Jpeg.decode: unexpected marker 0xFF$m%02X inside entropy data")
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RST marker. */
    def restart(expected: Int): Unit = {
      nbits = 0
      require(pos + 1 < data.length, "Jpeg.decode: truncated at restart marker")
      require((data(pos) & 0xff) == 0xff && (data(pos + 1) & 0xff) == 0xd0 + expected,
        f"Jpeg.decode: expected RST$expected%d at $pos, got " +
          f"0x${data(pos) & 0xff}%02X${data(pos + 1) & 0xff}%02X")
      pos += 2
    }
    def alignToByte(): Unit = { nbits = 0 }
  }

  private def huffDecode(br: BitReader, table: Map[(Int, Int), Int]): Int = {
    var code = 0
    var len = 0
    while (len < 16) {
      code = (code << 1) | br.bit()
      len += 1
      table.get((len, code)) match {
        case Some(v) => return v
        case None =>
      }
    }
    throw new IllegalArgumentException(
      "Jpeg.decode: invalid Huffman code (corrupt entropy data)")
  }

  /** Sign-extend a magnitude-coded value of the given category (F.12). */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** The APP1/Exif segment body carrying ONE orientation tag (for the
    * fixture planting path): `Exif\0\0` + a little-endian TIFF header
    * whose IFD0 holds tag 0x0112 (SHORT, count 1). Public formats: EXIF
    * 2.x over TIFF 6.0.
    */
  def exifApp1(orientation: Int): Array[Int] = {
    require(orientation >= 1 && orientation <= 8,
      s"Jpeg.exifApp1: orientation $orientation out of 1..8")
    Array(
      'E'.toInt, 'x'.toInt, 'i'.toInt, 'f'.toInt, 0, 0,
      'I'.toInt, 'I'.toInt, 0x2a, 0x00,       // II byte order, TIFF magic
      8, 0, 0, 0,                             // IFD0 at offset 8
      1, 0,                                   // one entry
      0x12, 0x01, 3, 0, 1, 0, 0, 0,           // tag 0x0112, SHORT, count 1
      orientation, 0, 0, 0,                   // value in the low 2 bytes
      0, 0, 0, 0)                             // no next IFD
  }

  /** EXIF orientation (1..8) from a JPEG payload's APP1 segment — 1
    * (upright) when no APP1/Exif/orientation tag is present. Both TIFF
    * byte orders; offsets validated against the segment, corrupt TIFF
    * structures reject by name rather than guessing upright.
    */
  def exifOrientation(payload: Array[Byte]): Int = {
    require(payload.length >= 2 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8,
      "Jpeg.exifOrientation: not a JPEG payload")
    var pos = 2
    while (pos + 3 < payload.length) {
      if ((payload(pos) & 0xff) != 0xff) return 1 // entropy data reached
      val marker = payload(pos + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) { pos += 2 }
      else if (marker == 0xd9 || marker == 0xda) return 1 // no APP1 before scan
      else {
        val len = ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
        require(len >= 2 && pos + 2 + len <= payload.length,
          "Jpeg.exifOrientation: truncated segment")
        if (marker == 0xe1 && len >= 16 &&
          new String(payload, pos + 4, 4, "US-ASCII") == "Exif" &&
          payload(pos + 8) == 0 && payload(pos + 9) == 0) {
          val tiff = pos + 10 // TIFF header origin; offsets are relative here
          val end = pos + 2 + len
          val bo = new String(payload, tiff, 2, "US-ASCII")
          require(bo == "II" || bo == "MM",
            s"Jpeg.exifOrientation: bad TIFF byte order '$bo'")
          val le = bo == "II"
          def u16(p: Int): Int = {
            require(p + 1 < end, "Jpeg.exifOrientation: TIFF read past APP1")
            if (le) (payload(p) & 0xff) | ((payload(p + 1) & 0xff) << 8)
            else ((payload(p) & 0xff) << 8) | (payload(p + 1) & 0xff)
          }
          def u32(p: Int): Long = {
            require(p + 3 < end, "Jpeg.exifOrientation: TIFF read past APP1")
            if (le) (u16(p) & 0xffffL) | ((u16(p + 2) & 0xffffL) << 16)
            else ((u16(p) & 0xffffL) << 16) | (u16(p + 2) & 0xffffL)
          }
          require(u16(tiff + 2) == 0x2a, "Jpeg.exifOrientation: bad TIFF magic")
          val ifdOff = u32(tiff + 4)
          require(ifdOff >= 8 && tiff + ifdOff + 2 <= end,
            s"Jpeg.exifOrientation: IFD0 offset $ifdOff outside the APP1 segment")
          val ifd = tiff + ifdOff.toInt
          val n = u16(ifd)
          var e = 0
          while (e < n) {
            val at = ifd + 2 + e * 12
            if (u16(at) == 0x0112) {
              val v = u16(at + 8) // SHORT value sits in the value field
              return if (v >= 1 && v <= 8) v else 1
            }
            e += 1
          }
          return 1
        }
        pos += 2 + len
      }
    }
    1
  }

  /** Per-scan entropy state: DC predictors (per scan-component slot),
    * the progressive EOB run, and the restart-marker cursor.
    */
  private final class ScanState(br: BitReader) {
    val dcPred = new Array[Int](4)
    var eobrun = 0
    private var rstIdx = 0
    def restart(): Unit = {
      br.restart(rstIdx % 8)
      rstIdx += 1
      java.util.Arrays.fill(dcPred, 0)
      eobrun = 0
    }
  }

  /** REAL decoder — baseline (SOF0) and progressive (SOF2): marker walk
    * with multi-table DQT/DHT and fill-byte tolerance, DRI/RST handling,
    * Huffman entropy decode into a per-component COEFFICIENT STORE (one
    * scan for baseline; spectral-selection + successive-approximation
    * scan accumulation per T.81 §G for progressive), then one shared
    * dequant + pinned-IDCT reconstruction, replication chroma upsample,
    * JFIF YCbCr→RGB. Arithmetic coding, lossless, hierarchical and
    * 12-bit reject by name. Returns the same [[Png.Image]] shape the PNG
    * decoder yields so the whole image pipeline is container-agnostic.
    */
  def decode(payload: Array[Byte]): Png.Image = {
    require(payload.length >= 2 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8,
      "Jpeg.decode: not a JPEG payload (missing SOI)")
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[Map[(Int, Int), Int]](4)
    val acTables = new Array[Map[(Int, Int), Int]](4)
    var width = -1; var height = -1
    // per component: (id, hf, vf, quantId)
    var frameComps: Array[(Int, Int, Int, Int)] = null
    var progressive = false
    var restartInterval = 0
    var sawScan = false
    // geometry + coefficient store, allocated at SOF. blocksW/H are the
    // component's REAL block counts (ceil(compDim/8) — what a
    // non-interleaved scan covers); blocksWpad/Hpad the MCU-padded grid
    // the store is laid out on. coefs(ci) holds 64 row-major (v·8+u)
    // coefficients per block at (bRow·blocksWpad + bCol)·64.
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0
    var blocksW: Array[Int] = null; var blocksH: Array[Int] = null
    var blocksWpad: Array[Int] = null; var blocksHpad: Array[Int] = null
    var coefs: Array[Array[Int]] = null

    def u16(p: Int): Int = {
      require(p + 1 < payload.length, "Jpeg.decode: truncated segment length")
      ((payload(p) & 0xff) << 8) | (payload(p + 1) & 0xff)
    }

    /** One scan's entropy data: baseline full-block MCUs, or one
      * progressive (Ss, Se, Ah, Al) pass. A single-component scan walks
      * the component's own block grid (T.81 A.2.2); an interleaved scan
      * walks the MCU grid.
      */
    def decodeScan(br: BitReader, scanComps: Array[(Int, Int, Int)],
                   ss: Int, se: Int, ah: Int, al: Int): Unit = {
      val st = new ScanState(br)
      val ns = scanComps.length
      val dcScan = ss == 0
      if (!progressive)
        require(ss == 0 && se == 63 && ah == 0 && al == 0,
          s"Jpeg.decode: baseline scan carries progressive parameters ($ss,$se,$ah,$al)")
      else {
        require(ss <= 63 && se <= 63 && ss <= se && al <= 13,
          s"Jpeg.decode: bad spectral/approximation parameters ($ss,$se,$ah,$al)")
        if (dcScan) require(se == 0, "Jpeg.decode: progressive DC scan with Se != 0")
        else require(ns == 1,
          "Jpeg.decode: progressive AC scan must be single-component")
      }
      def dcT(si: Int): Map[(Int, Int), Int] = {
        val t = dcTables(scanComps(si)._2)
        require(t != null, s"Jpeg.decode: scan uses missing DC table ${scanComps(si)._2}")
        t
      }
      def acT(si: Int): Map[(Int, Int), Int] = {
        val t = acTables(scanComps(si)._3)
        require(t != null, s"Jpeg.decode: scan uses missing AC table ${scanComps(si)._3}")
        t
      }

      // baseline: DC diff + full AC run-length into one block
      def blockBaseline(si: Int, ci: Int, off: Int): Unit = {
        val s = huffDecode(br, dcT(si))
        require(s <= 11, s"Jpeg.decode: DC category $s out of range")
        st.dcPred(si) += extend(br.bits(s), s)
        coefs(ci)(off) = st.dcPred(si)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = huffDecode(br, acT(si))
          if (rs == 0x00) eob = true
          else if (rs == 0xf0) k += 16
          else {
            k += (rs >> 4) & 0xf
            require(k < 64, "Jpeg.decode: AC run overruns the block")
            val sz = rs & 0xf
            coefs(ci)(off + zigzag(k)) = extend(br.bits(sz), sz)
            k += 1
          }
        }
      }

      // progressive DC first pass: predictor accumulates unshifted, the
      // stored coefficient is point-transformed by Al (T.81 G.1.2.1)
      def dcFirst(si: Int, ci: Int, off: Int): Unit = {
        val s = huffDecode(br, dcT(si))
        require(s <= 11, s"Jpeg.decode: DC category $s out of range")
        st.dcPred(si) += extend(br.bits(s), s)
        coefs(ci)(off) = st.dcPred(si) << al
      }

      // progressive DC refinement: one correction bit per block
      def dcRefine(ci: Int, off: Int): Unit =
        if (br.bit() == 1) coefs(ci)(off) |= (1 << al)

      // progressive AC first pass over [Ss, Se] with EOB runs (G.1.2.2)
      def acFirst(si: Int, ci: Int, off: Int): Unit = {
        if (st.eobrun > 0) { st.eobrun -= 1; return }
        val tbl = acT(si)
        var k = ss
        var done = false
        while (k <= se && !done) {
          val rs = huffDecode(br, tbl)
          val r = (rs >> 4) & 0xf; val s = rs & 0xf
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else {
              st.eobrun = (1 << r) - 1
              if (r > 0) st.eobrun += br.bits(r)
              done = true
            }
          } else {
            k += r
            require(k <= se, "Jpeg.decode: AC run overruns the spectral band")
            coefs(ci)(off + zigzag(k)) = extend(br.bits(s), s) << al
            k += 1
          }
        }
      }

      // progressive AC refinement (G.1.2.3): newly-nonzero coefficients
      // arrive as ±2^Al; every already-nonzero coefficient passed on the
      // way reads a correction bit; EOB runs carry correction bits for
      // the rest of the band
      def acRefine(si: Int, ci: Int, off: Int): Unit = {
        val p1 = 1 << al; val m1 = -1 << al
        val cs = coefs(ci)
        def correct(idx: Int): Unit =
          if (br.bit() == 1 && (cs(idx) & p1) == 0)
            cs(idx) += (if (cs(idx) >= 0) p1 else m1)
        val tbl = acT(si)
        var k = ss
        if (st.eobrun == 0) {
          var done = false
          while (k <= se && !done) {
            val rs = huffDecode(br, tbl)
            var r = (rs >> 4) & 0xf; val s = rs & 0xf
            var newVal = 0
            if (s == 0) {
              if (r < 15) {
                // the run INCLUDES the current block — the trailing
                // correction pass below consumes it and decrements
                st.eobrun = 1 << r
                if (r > 0) st.eobrun += br.bits(r)
                done = true
              }
              // r == 15: ZRL — skip 16 zero-history positions below
            } else {
              require(s == 1, s"Jpeg.decode: AC refinement magnitude $s != 1")
              newVal = if (br.bit() == 1) p1 else m1
            }
            if (!done) {
              var placed = false
              while (k <= se && !placed) {
                val idx = off + zigzag(k)
                if (cs(idx) != 0) correct(idx)
                else if (r == 0) {
                  if (newVal != 0) cs(idx) = newVal
                  placed = true
                } else r -= 1
                k += 1
              }
            }
          }
        }
        if (st.eobrun > 0) {
          while (k <= se) {
            val idx = off + zigzag(k)
            if (cs(idx) != 0) correct(idx)
            k += 1
          }
          st.eobrun -= 1
        }
      }

      val total =
        if (ns == 1) blocksW(scanComps(0)._1) * blocksH(scanComps(0)._1)
        else mcusX * mcusY
      var unit = 0
      while (unit < total) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0)
          st.restart()
        if (ns == 1) {
          val ci = scanComps(0)._1
          val bW = blocksW(ci)
          val off = ((unit / bW) * blocksWpad(ci) + unit % bW) * 64
          if (!progressive) blockBaseline(0, ci, off)
          else if (dcScan) { if (ah == 0) dcFirst(0, ci, off) else dcRefine(ci, off) }
          else { if (ah == 0) acFirst(0, ci, off) else acRefine(0, ci, off) }
        } else {
          val my = unit / mcusX; val mx = unit % mcusX
          var si = 0
          while (si < ns) {
            val ci = scanComps(si)._1
            val (_, hf, vf, _) = frameComps(ci)
            var v = 0
            while (v < vf) {
              var h = 0
              while (h < hf) {
                val off = ((my * vf + v) * blocksWpad(ci) + mx * hf + h) * 64
                if (!progressive) blockBaseline(si, ci, off)
                else if (ah == 0) dcFirst(si, ci, off)
                else dcRefine(ci, off)
                h += 1
              }
              v += 1
            }
            si += 1
          }
        }
        unit += 1
      }
      br.alignToByte()
    }

    var eoi = false
    while (!eoi) {
      // tolerate fill bytes: any number of 0xFF may precede a marker
      while (pos + 1 < payload.length && (payload(pos) & 0xff) == 0xff &&
        (payload(pos + 1) & 0xff) == 0xff) pos += 1
      require(pos + 1 < payload.length, "Jpeg.decode: ran off the payload before EOI")
      require((payload(pos) & 0xff) == 0xff,
        f"Jpeg.decode: expected a marker at $pos, got 0x${payload(pos) & 0xff}%02X")
      val marker = payload(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd8 => // stray SOI — tolerate
        case m if sofNames.contains(m) =>
          throw new IllegalArgumentException(
            s"Jpeg.decode: ${sofNames(m)} JPEG not supported " +
              "(baseline SOF0 and progressive SOF2 only)")
        case 0xc0 | 0xc2 =>
          require(frameComps == null, "Jpeg.decode: multiple frames not supported")
          progressive = marker == 0xc2
          val len = u16(pos)
          val prec = payload(pos + 2) & 0xff
          require(prec == 8, s"Jpeg.decode: only 8-bit precision supported, got $prec")
          height = u16(pos + 3); width = u16(pos + 5)
          require(width > 0 && height > 0,
            s"Jpeg.decode: bad frame dims ${width}x$height (DNL not supported)")
          val nc = payload(pos + 7) & 0xff
          require(nc == 1 || nc == 3,
            s"Jpeg.decode: $nc components not supported (grayscale or YCbCr only)")
          frameComps = Array.tabulate(nc) { ci =>
            val o = pos + 8 + ci * 3
            val id = payload(o) & 0xff
            val hv = payload(o + 1) & 0xff
            val hf = (hv >> 4) & 0xf; val vf = hv & 0xf
            require(hf >= 1 && hf <= 2 && vf >= 1 && vf <= 2,
              s"Jpeg.decode: sampling factors ${hf}x$vf out of the supported 1..2 range")
            (id, hf, vf, payload(o + 2) & 0xff)
          }
          hMax = frameComps.map(_._2).max; vMax = frameComps.map(_._3).max
          mcusX = (width + 8 * hMax - 1) / (8 * hMax)
          mcusY = (height + 8 * vMax - 1) / (8 * vMax)
          blocksW = frameComps.map { case (_, hf, _, _) =>
            ((width * hf + hMax - 1) / hMax + 7) / 8 }
          blocksH = frameComps.map { case (_, _, vf, _) =>
            ((height * vf + vMax - 1) / vMax + 7) / 8 }
          blocksWpad = frameComps.map { case (_, hf, _, _) => mcusX * hf }
          blocksHpad = frameComps.map { case (_, _, vf, _) => mcusY * vf }
          coefs = Array.tabulate(nc)(ci =>
            new Array[Int](blocksWpad(ci) * blocksHpad(ci) * 64))
          pos += len
        case 0xdb =>
          val len = u16(pos)
          var p = pos + 2
          while (p < pos + len) {
            val pqTq = payload(p) & 0xff
            val pq = (pqTq >> 4) & 0xf; val tq = pqTq & 0xf
            require(pq <= 1, s"Jpeg.decode: bad DQT precision $pq")
            require(tq < 4, s"Jpeg.decode: bad DQT table id $tq")
            val tbl = new Array[Int](64)
            var k = 0
            while (k < 64) {
              tbl(zigzag(k)) =
                if (pq == 0) payload(p + 1 + k) & 0xff
                else u16(p + 1 + 2 * k)
              k += 1
            }
            quant(tq) = tbl
            p += 1 + (if (pq == 0) 64 else 128)
          }
          pos += len
        case 0xc4 =>
          val len = u16(pos)
          var p = pos + 2
          while (p < pos + len) {
            val tcTh = payload(p) & 0xff
            val tc = (tcTh >> 4) & 0xf; val th = tcTh & 0xf
            require(tc <= 1, s"Jpeg.decode: bad DHT class $tc")
            require(th < 4, s"Jpeg.decode: bad DHT table id $th")
            val bits = Array.tabulate(16)(i => payload(p + 1 + i) & 0xff)
            val nv = bits.sum
            val vals = Array.tabulate(nv)(i => payload(p + 17 + i) & 0xff)
            if (tc == 0) dcTables(th) = decTable(bits, vals)
            else acTables(th) = decTable(bits, vals)
            p += 17 + nv
          }
          pos += len
        case 0xdd =>
          restartInterval = u16(pos + 2)
          pos += u16(pos)
        case 0xda =>
          val len = u16(pos)
          require(frameComps != null, "Jpeg.decode: SOS before SOF")
          val ns = payload(pos + 2) & 0xff
          require(ns >= 1 && ns <= frameComps.length,
            s"Jpeg.decode: scan component count $ns out of range")
          if (!progressive)
            require(ns == frameComps.length,
              s"Jpeg.decode: baseline scan with $ns of ${frameComps.length} " +
                "components (multi-scan sequential not supported)")
          val scanComps = Array.tabulate(ns) { si =>
            val o = pos + 3 + si * 2
            val cid = payload(o) & 0xff
            val fi = frameComps.indexWhere(_._1 == cid)
            require(fi >= 0, s"Jpeg.decode: scan references unknown component $cid")
            val tt = payload(o + 1) & 0xff
            (fi, (tt >> 4) & 0xf, tt & 0xf)
          }
          val ss = payload(pos + 3 + ns * 2) & 0xff
          val se = payload(pos + 4 + ns * 2) & 0xff
          val aa = payload(pos + 5 + ns * 2) & 0xff
          val br = new BitReader(payload, pos + len)
          decodeScan(br, scanComps, ss, se, (aa >> 4) & 0xf, aa & 0xf)
          sawScan = true
          pos = br.pos
        case 0xd9 =>
          eoi = true
        case m if m >= 0xe0 && m <= 0xef => pos += u16(pos) // APPn
        case 0xfe => pos += u16(pos) // COM
        case m =>
          throw new IllegalArgumentException(
            f"Jpeg.decode: unsupported marker 0xFF$m%02X")
      }
    }
    require(frameComps != null, "Jpeg.decode: missing SOF")
    require(sawScan, "Jpeg.decode: EOI before any scan data")

    // shared reconstruction: dequantize + pinned IDCT per stored block
    val nc = frameComps.length
    frameComps.foreach { case (_, _, _, qid) =>
      require(quant(qid) != null, s"Jpeg.decode: missing quant table $qid")
    }
    val planeW = Array.tabulate(nc)(ci => blocksWpad(ci) * 8)
    val planes = Array.tabulate(nc)(ci =>
      new Array[Int](blocksWpad(ci) * 8 * blocksHpad(ci) * 8))
    var ci = 0
    while (ci < nc) {
      val q = quant(frameComps(ci)._4)
      val bW = blocksWpad(ci); val nBlocks = bW * blocksHpad(ci)
      val pw = planeW(ci)
      var b = 0
      while (b < nBlocks) {
        val blk = dequantIdct(
          java.util.Arrays.copyOfRange(coefs(ci), b * 64, b * 64 + 64), q)
        val bR = b / bW; val bC = b % bW
        var y = 0
        while (y < 8) {
          System.arraycopy(blk, y * 8, planes(ci), (bR * 8 + y) * pw + bC * 8, 8)
          y += 1
        }
        b += 1
      }
      ci += 1
    }

    def clamp255(v: Int) = math.max(0, math.min(255, v))
    if (nc == 1) {
      val pw = planeW(0)
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = planes(0)(y * pw + x).toByte
          x += 1
        }
        y += 1
      }
      Png.Image(width, height, 1, out)
    } else {
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def samp(c: Int): Int = {
            val (_, hf, vf, _) = frameComps(c)
            planes(c)((y * vf / vMax) * planeW(c) + (x * hf / hMax))
          }
          val yv = samp(0); val cb = samp(1); val cr = samp(2)
          val o = (y * width + x) * 3
          out(o) = clamp255(math.floor(yv + 1.402 * (cr - 128) + 0.5).toInt).toByte
          out(o + 1) = clamp255(math.floor(
            yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5).toInt).toByte
          out(o + 2) = clamp255(math.floor(yv + 1.772 * (cb - 128) + 0.5).toInt).toByte
          x += 1
        }
        y += 1
      }
      Png.Image(width, height, 3, out)
    }
  }
}
