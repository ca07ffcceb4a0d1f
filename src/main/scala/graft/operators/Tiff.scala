package graft.operators

/** Pure-JVM TIFF codec — the scanned-document raster format (archives,
  * digitized books, fax corpora: the image-side complement of the PDF
  * tier). Baseline TIFF 6.0 from the public spec: both byte orders
  * (II little / MM big), the IFD tag walk, strip-organized image data;
  * decode covers UNCOMPRESSED (1), LZW (5 — the dominant real
  * scanned-book/archival compression: MSB-first bit packing, 256/257
  * control codes, 9..12-bit widths with the spec's "early change"
  * bump, per-strip streams) and PACKBITS (32773) gray/RGB(A) at
  * 8 bits per sample, with the horizontal-differencing Predictor (tag
  * 317 = 2) undone after decompression. CCITT/JPEG-in-TIFF/deflate
  * compressions are metadata-only and decode REJECTS BY COMPRESSION
  * NAME (the MP4/H.264 posture); tiled TIFFs, planar configuration 2,
  * sub-8-bit depths and the floating-point predictor reject by name
  * too.
  *
  * Crafted-payload hygiene: every offset/count is bounds-checked before
  * use (IFD entries, strip offsets + byte counts vs the payload, value
  * offsets vs inline values), the pixel count is capped before
  * allocation, and PackBits runs must land exactly on the expected
  * strip size.
  *
  * Reference behavior being matched: the reference stores such payloads
  * as opaque blobs; image decode is a pipeline extension per the brief.
  */
object Tiff {

  private val MaxPixels = 1 << 26

  case class Meta(byte_order: String, width: Int, height: Int,
                  bits_per_sample: Int, samples_per_pixel: Int,
                  compression: String, n_strips: Int)

  private final class Reader(b: Array[Byte], le: Boolean) {
    val n: Int = b.length
    def u16(at: Long): Int = {
      require(at >= 0 && at + 2 <= n, s"Tiff.parse: 16-bit read at $at overruns $n bytes")
      val i = at.toInt
      if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    }
    def u32(at: Long): Long = {
      require(at >= 0 && at + 4 <= n, s"Tiff.parse: 32-bit read at $at overruns $n bytes")
      val i = at.toInt
      if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    }
  }

  private def compressionName(c: Long): String = c match {
    case 1 => "none"
    case 2 | 3 | 4 => "ccitt"
    case 5 => "lzw"
    case 6 | 7 => "jpeg"
    case 8 | 32946 => "deflate"
    case 32773 => "packbits"
    case other => s"compression$other"
  }

  /** Parsed first-IFD fields (the baseline image). */
  private case class Ifd(width: Int, height: Int, bps: Int, spp: Int,
                         compression: Long, stripOffsets: IndexedSeq[Long],
                         stripCounts: IndexedSeq[Long], rowsPerStrip: Long,
                         planar: Long, predictor: Long)

  private def readIfd(payload: Array[Byte]): (Ifd, Boolean) =
    readIfdAt(payload, -1)._1 match { case (ifd, le) => (ifd, le) }

  /** Parse the IFD at `at` (-1 = the header's first IFD); returns the
    * fields plus the next-IFD offset (0 = end of chain).
    */
  private def readIfdAt(payload: Array[Byte], at: Long): ((Ifd, Boolean), Long) = {
    val n = payload.length
    require(n >= 8, s"Tiff.parse: $n bytes is smaller than a TIFF header")
    val le = payload(0) == 'I' && payload(1) == 'I'
    val be = payload(0) == 'M' && payload(1) == 'M'
    require(le || be, "Tiff.parse: no II/MM byte-order mark")
    val r = new Reader(payload, le)
    require(r.u16(2) == 42, s"Tiff.parse: magic ${r.u16(2)} != 42")
    val ifdAt = if (at < 0) r.u32(4) else at
    require(ifdAt >= 8 && ifdAt + 2 <= n, s"Tiff.parse: IFD offset $ifdAt overruns")
    val count = r.u16(ifdAt)
    require(ifdAt + 2 + count * 12L + 4 <= n,
      s"Tiff.parse: IFD of $count entries overruns the $n-byte payload")
    var width = 0; var height = 0; var bps = 1; var spp = 1
    var compression = 1L; var rowsPerStrip = Long.MaxValue; var planar = 1L
    var predictor = 1L
    var stripOffsets = IndexedSeq.empty[Long]
    var stripCounts = IndexedSeq.empty[Long]
    (0 until count).foreach { k =>
      val e = ifdAt + 2 + k * 12L
      val tag = r.u16(e)
      val tpe = r.u16(e + 2)
      val cnt = r.u32(e + 4)
      def typeSize: Long = tpe match {
        case 1 | 2 | 6 | 7 => 1; case 3 => 2; case 4 | 9 | 11 => 4
        case 5 | 10 | 12 => 8
        case other => throw new IllegalArgumentException(
          s"Tiff.parse: field type $other on tag $tag")
      }
      // values inline when they fit in 4 bytes, else behind an offset
      val valAt = if (cnt * typeSize <= 4) e + 8 else {
        val off = r.u32(e + 8)
        require(off + cnt * typeSize <= n,
          s"Tiff.parse: tag $tag values at $off overrun the payload")
        off
      }
      def valueAt(i: Long): Long = tpe match {
        case 3 => r.u16(valAt + i * 2).toLong
        case 4 => r.u32(valAt + i * 4)
        case 1 => payload((valAt + i).toInt) & 0xffL
        case other => throw new IllegalArgumentException(
          s"Tiff.parse: tag $tag with value type $other (SHORT/LONG/BYTE)")
      }
      tag match {
        case 256 => width = valueAt(0).toInt
        case 257 => height = valueAt(0).toInt
        case 258 =>
          bps = valueAt(0).toInt
          (1L until cnt).foreach(i => require(valueAt(i).toInt == bps,
            "Tiff.parse: heterogeneous BitsPerSample not supported"))
        case 259 => compression = valueAt(0)
        case 277 => spp = valueAt(0).toInt
        case 273 => stripOffsets = (0L until cnt).map(valueAt).toIndexedSeq
        case 279 => stripCounts = (0L until cnt).map(valueAt).toIndexedSeq
        case 278 => rowsPerStrip = valueAt(0)
        case 284 => planar = valueAt(0)
        case 317 => predictor = valueAt(0)
        case _ => () // orientation/resolution/photometric/...: metadata
      }
    }
    require(width > 0 && height > 0, s"Tiff.parse: dims $width x $height")
    val nextIfd = r.u32(ifdAt + 2 + count * 12L)
    ((Ifd(width, height, bps, spp, compression, stripOffsets, stripCounts,
      rowsPerStrip, planar, predictor), le), nextIfd)
  }

  /** Page count: walk the next-IFD chain (multi-page scanned books),
    * cycle-guarded and capped.
    */
  def pageCount(payload: Array[Byte]): Int = {
    var pages = 0
    var at = -1L
    val seen = scala.collection.mutable.Set.empty[Long]
    var going = true
    while (going) {
      val (_, next) = readIfdAt(payload, at)
      pages += 1
      require(pages <= 10000, "Tiff.parse: more than 10000 IFDs (runaway chain)")
      if (next == 0) going = false
      else {
        require(seen.add(next), s"Tiff.parse: circular IFD chain at $next")
        at = next
      }
    }
    pages
  }

  def meta(payload: Array[Byte]): Meta = {
    val (ifd, le) = readIfd(payload)
    Meta(if (le) "II" else "MM", ifd.width, ifd.height, ifd.bps, ifd.spp,
      compressionName(ifd.compression), ifd.stripOffsets.length)
  }

  // ── LZW (TIFF variant: MSB-first bit packing, 8-bit symbols with
  //    Clear=256 / EOI=257, 9..12-bit code widths, and the spec's
  //    "early change": the width bumps one code EARLIER than plain LZW,
  //    when the next free entry reaches 2^w - 1 on the decoder side.
  //    Each strip is its own stream. Distinct from the GIF variant in
  //    operators/Gif.scala (LSB-first, palette-sized roots). ──────────

  private val LzwClear = 256
  private val LzwEoi = 257

  /** TIFF-LZW compress one strip (predictor differencing is the
    * caller's job). Encoder-side width bumps at next == 2^w and the
    * EOI-time catch-up at 2^w - 1 mirror the decoder's lag exactly —
    * see the GIF writer for the same derivation in the LSB world.
    */
  def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0; var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code; nbits += width
      while (nbits >= 8) {
        out.write(((acc >> (nbits - 8)) & 0xff).toInt); nbits -= 8
      }
    }
    val dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var next = 258
    def reset(): Unit = { dict.clear(); next = 258; width = 9 }
    put(LzwClear)
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val sym = data(i) & 0xff
      if (prefix < 0) prefix = sym
      else dict.get((prefix, sym)) match {
        case Some(code) => prefix = code
        case None =>
          put(prefix)
          // table-full: clear at 4094 (the libtiff convention) so the
          // decoder never needs a 13th bit
          if (next == 4094) { put(LzwClear); reset() }
          else {
            dict((prefix, sym)) = next; next += 1
            if (next == (1 << width) && width < 12) width += 1
          }
          prefix = sym
      }
      i += 1
    }
    if (prefix >= 0) put(prefix)
    // by EOI time the decoder's registrations have caught up, so its
    // early-change bump fires at 2^w - 1 — mirror it before writing EOI
    if (next == (1 << width) - 1 && width < 12) width += 1
    put(LzwEoi)
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt)
    out.toByteArray
  }

  /** Decode one strip's TIFF-LZW stream to exactly `expected` bytes. */
  private[graft] def lzwDecode(data: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outLen = 0
    // dictionary as (prefix code, tail symbol); roots 0..255 implicit
    val prefixOf = new Array[Int](4096)
    val tailOf = new Array[Int](4096)
    var next = 258
    var width = 9
    var acc = 0L; var nbits = 0; var pos = 0
    var prev = -1
    def emit(code: Int): Int = { // writes the string of `code`, returns its head
      var c = code
      var n = 0
      while (c >= 258) { n += 1; c = prefixOf(c) } // count depth
      val head = c
      var idx = outLen + n
      require(idx < expected, "Tiff.parse: LZW output overruns the strip")
      c = code
      while (c >= 258) { out(idx) = tailOf(c).toByte; idx -= 1; c = prefixOf(c) }
      out(idx) = c.toByte
      outLen += n + 1
      head
    }
    var done = false
    while (!done) {
      while (nbits < width && pos < data.length) {
        acc = (acc << 8) | (data(pos) & 0xffL); nbits += 8; pos += 1
      }
      require(nbits >= width, "Tiff.parse: LZW strip truncated (no EOI)")
      val code = ((acc >> (nbits - width)) & ((1L << width) - 1)).toInt
      nbits -= width
      if (code == LzwClear) { next = 258; width = 9; prev = -1 }
      else if (code == LzwEoi) done = true
      else {
        require(code < next || (code == next && prev >= 0),
          s"Tiff.parse: LZW code $code outside the dictionary")
        require(outLen < expected, "Tiff.parse: LZW output overruns the strip")
        val head =
          if (code == next) { // KwKwK: string = prev-string + its own head
            val h = emit(prev)
            require(outLen < expected, "Tiff.parse: LZW output overruns the strip")
            out(outLen) = h.toByte; outLen += 1
            h
          } else emit(code)
        if (prev >= 0 && next < 4096) {
          prefixOf(next) = prev; tailOf(next) = head
          next += 1
          // early change: one entry before the plain-LZW 2^w boundary
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
        prev = code
      }
    }
    require(outLen == expected,
      s"Tiff.parse: LZW strip decoded $outLen of $expected bytes")
    out
  }

  /** PackBits (Apple RLE) decode to exactly `expect` bytes. */
  private def unpackBits(b: Array[Byte], from: Long, len: Long, expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var p = from
    val end = from + len
    var o = 0
    while (o < expect) {
      require(p < end, s"Tiff.parse: PackBits strip exhausted at $o of $expect bytes")
      val c = b(p.toInt).toInt; p += 1
      if (c >= 0) {
        require(p + c + 1 <= end && o + c + 1 <= expect,
          "Tiff.parse: PackBits literal run overruns")
        var i = 0
        while (i <= c) { out(o) = b(p.toInt); p += 1; o += 1; i += 1 }
      } else if (c != -128) {
        require(p < end && o + (1 - c) <= expect,
          "Tiff.parse: PackBits repeat run overruns")
        val v = b(p.toInt); p += 1
        var i = 0
        while (i < 1 - c) { out(o) = v; o += 1; i += 1 }
      } // -128: no-op per spec
    }
    out
  }

  /** Decode a baseline strip-organized TIFF to the tier's image shape.
    * 8-bit gray (1 spp), RGB (3) and RGBA (4); uncompressed or PackBits.
    */
  def decode(payload: Array[Byte]): Png.Image = {
    val (ifd, _) = readIfd(payload)
    require(ifd.bps == 8,
      s"Tiff.parse: ${ifd.bps}-bit samples not supported (8-bit baseline only)")
    require(ifd.spp == 1 || ifd.spp == 3 || ifd.spp == 4,
      s"Tiff.parse: ${ifd.spp} samples/pixel (gray/RGB/RGBA only)")
    require(ifd.planar == 1,
      "Tiff.parse: planar configuration 2 (separate planes) not supported")
    require(ifd.compression == 1 || ifd.compression == 5 ||
      ifd.compression == 32773,
      s"Tiff.parse: ${compressionName(ifd.compression)} decode not supported " +
        "(uncompressed/LZW/PackBits only; metadata still reads)")
    require(ifd.predictor == 1 || ifd.predictor == 2,
      s"Tiff.parse: predictor ${ifd.predictor} not supported " +
        "(none/horizontal-differencing only)")
    require(ifd.stripOffsets.nonEmpty &&
      ifd.stripOffsets.length == ifd.stripCounts.length,
      s"Tiff.parse: ${ifd.stripOffsets.length} strip offsets vs " +
        s"${ifd.stripCounts.length} byte counts")
    val w = ifd.width; val h = ifd.height
    require(w.toLong * h <= MaxPixels,
      s"Tiff.parse: $w x $h pixels over the $MaxPixels cap — rejected, not allocated")
    val rowBytes = w * ifd.spp
    val rps = math.min(ifd.rowsPerStrip, h.toLong)
    require(rps > 0, "Tiff.parse: RowsPerStrip 0")
    val expectStrips = ((h + rps - 1) / rps).toInt
    require(ifd.stripOffsets.length == expectStrips,
      s"Tiff.parse: ${ifd.stripOffsets.length} strips for $h rows at $rps rows/strip")
    val out = new Array[Byte](h * rowBytes)
    var row = 0
    ifd.stripOffsets.zip(ifd.stripCounts).foreach { case (off, cnt) =>
      val rows = math.min(rps, h - row).toInt
      val expect = rows * rowBytes
      require(off >= 0 && off + cnt <= payload.length,
        s"Tiff.parse: strip [$off, ${off + cnt}) overruns the payload")
      val data =
        if (ifd.compression == 1) {
          require(cnt == expect,
            s"Tiff.parse: uncompressed strip of $cnt bytes, expected $expect")
          java.util.Arrays.copyOfRange(payload, off.toInt, (off + cnt).toInt)
        } else if (ifd.compression == 5)
          lzwDecode(java.util.Arrays.copyOfRange(payload, off.toInt,
            (off + cnt).toInt), expect)
        else unpackBits(payload, off, cnt, expect)
      // horizontal differencing undoes per row, so strip-local is exact
      if (ifd.predictor == 2) {
        var r0 = 0
        while (r0 < rows) {
          var i = ifd.spp
          while (i < rowBytes) {
            data(r0 * rowBytes + i) =
              (data(r0 * rowBytes + i) + data(r0 * rowBytes + i - ifd.spp)).toByte
            i += 1
          }
          r0 += 1
        }
      }
      System.arraycopy(data, 0, out, row * rowBytes, expect)
      row += rows
    }
    Png.Image(w, h, ifd.spp, out)
  }

  // =====================================================================
  // encode (planted fixtures)
  // =====================================================================

  /** PackBits encode (repeat runs >= 3, literals otherwise). */
  def packBits(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    @inline def repeatAt(j: Int): Boolean =
      j + 2 < data.length && data(j) == data(j + 1) && data(j + 1) == data(j + 2)
    var i = 0
    while (i < data.length) {
      if (repeatAt(i)) {
        var run = 3
        while (i + run < data.length && run < 128 && data(i + run) == data(i)) run += 1
        out.write(1 - run); out.write(data(i)); i += run
      } else {
        val start = i
        var j = i + 1
        while (j < data.length && j - start < 128 && !repeatAt(j)) j += 1
        out.write((j - start) - 1)
        out.write(data, start, j - start)
        i = j
      }
    }
    out.toByteArray
  }

  /** Write one baseline strip-organized TIFF: `le` picks the byte
    * order, `compression` is the tag-259 value (1 none / 5 LZW /
    * 32773 PackBits), `rowsPerStrip` the strip split, `predictor` the
    * tag-317 value (1 none / 2 horizontal differencing).
    */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
             le: Boolean, compression: Int, rowsPerStrip: Int,
             predictor: Int = 1): Array[Byte] =
    encodePages(Seq((width, height, channels, pixels)), le, compression,
      rowsPerStrip, predictor)

  /** Write a MULTI-PAGE baseline TIFF (the scanned-book shape): one
    * chained IFD block per page, each with its own dims/strips.
    */
  def encodePages(pages: Seq[(Int, Int, Int, Array[Byte])], le: Boolean,
                  compression: Int, rowsPerStrip: Int,
                  predictor: Int = 1): Array[Byte] = {
    require(pages.nonEmpty, "Tiff.encode: no pages")
    require(rowsPerStrip >= 1, s"Tiff.encode: rowsPerStrip $rowsPerStrip")
    require(compression == 1 || compression == 5 || compression == 32773,
      s"Tiff.encode: compression $compression (1/5/32773)")
    require(predictor == 1 || predictor == 2,
      s"Tiff.encode: predictor $predictor (1/2)")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (le) { out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt) }
      else { out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt) }
    out.write(if (le) 'I' else 'M'); out.write(if (le) 'I' else 'M')
    w16(42); w32(8) // first IFD right after the header
    // per-page block: IFD + value arrays + strips; sizes are computable
    // up front, so next-IFD pointers resolve in one pass
    val nEntries = if (predictor == 2) 11 else 10
    val ifdSize = 2 + nEntries * 12 + 4
    val prepared = pages.map { case (width, height, channels, pixels) =>
      require(pixels.length == width * height * channels,
        s"Tiff.encode: ${pixels.length} samples for $width x $height x $channels")
      val rowBytes = width * channels
      val strips = (0 until height by rowsPerStrip).map { r0 =>
        val rows = math.min(rowsPerStrip, height - r0)
        val raw = java.util.Arrays.copyOfRange(pixels, r0 * rowBytes,
          (r0 + rows) * rowBytes)
        if (predictor == 2) { // diff right-to-left so sources stay raw
          var r1 = 0
          while (r1 < rows) {
            var i = rowBytes - 1
            while (i >= channels) {
              raw(r1 * rowBytes + i) =
                (raw(r1 * rowBytes + i) - raw(r1 * rowBytes + i - channels)).toByte
              i -= 1
            }
            r1 += 1
          }
        }
        compression match {
          case 5 => lzwEncode(raw)
          case 32773 => packBits(raw)
          case _ => raw
        }
      }
      val bpsArrLen = if (channels > 2) channels * 2 else 0
      val arrLen = if (strips.length > 1) strips.length * 8 else 0
      val blockLen = ifdSize + bpsArrLen + arrLen + strips.map(_.length).sum
      (width, height, channels, strips, blockLen)
    }
    val blockStarts = prepared.scanLeft(8L)((a, p) => a + p._5).init
    prepared.zipWithIndex.foreach { case ((width, height, channels, strips, _), pi) =>
      val base = blockStarts(pi)
      val nStrips = strips.length
      val bpsArrAt = base + ifdSize
      val bpsArrLen = if (channels > 2) channels * 2 else 0
      val offArrAt = bpsArrAt + bpsArrLen
      val offArrLen = if (nStrips > 1) nStrips * 4 else 0
      val cntArrAt = offArrAt + offArrLen
      val cntArrLen = if (nStrips > 1) nStrips * 4 else 0
      val dataAt = cntArrAt + cntArrLen
      val stripOffsets = strips.scanLeft(dataAt)((a, s) => a + s.length).init
      w16(nEntries)
      def entry(tag: Int, tpe: Int, cnt: Long, inline: Long): Unit = {
        w16(tag); w16(tpe); w32(cnt); w32(inline)
      }
      def shortInline(v: Int): Long =
        if (le) v.toLong else v.toLong << 16 // SHORT sits in the first 2 bytes
      entry(256, 3, 1, shortInline(width))
      entry(257, 3, 1, shortInline(height))
      if (channels > 2) entry(258, 3, channels.toLong, bpsArrAt)
      else entry(258, 3, 1, shortInline(8))
      entry(259, 3, 1, shortInline(compression))
      entry(262, 3, 1, shortInline(if (channels == 1) 1 else 2)) // photometric
      if (nStrips > 1) entry(273, 4, nStrips.toLong, offArrAt)
      else entry(273, 4, 1, stripOffsets.head)
      entry(277, 3, 1, shortInline(channels))
      entry(278, 3, 1, shortInline(rowsPerStrip))
      if (nStrips > 1) entry(279, 4, nStrips.toLong, cntArrAt)
      else entry(279, 4, 1, strips.head.length.toLong)
      entry(284, 3, 1, shortInline(1)) // chunky planar
      if (predictor == 2) entry(317, 3, 1, shortInline(2))
      w32(if (pi + 1 < prepared.length) blockStarts(pi + 1) else 0L)
      if (channels > 2) (0 until channels).foreach(_ => w16(8))
      if (nStrips > 1) stripOffsets.foreach(w32)
      if (nStrips > 1) strips.foreach(s => w32(s.length.toLong))
      strips.foreach(s => out.write(s))
    }
    out.toByteArray
  }

  // =====================================================================
  // plant + Spark ops
  // =====================================================================

  import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
  import org.apache.spark.sql.functions._

  /** TIFF plant (spec for the fixture replica): 1 + id%3 pages (the
    * multi-page scanned-book shape, chained IFDs), every page at dims
    * 24 + id%9 × 16 + id%7; channels gray/RGB/RGBA by id%3 (1/3/4);
    * page p's sample i = (i·31 + i/7 + (id+p)·13) % 256; little-endian
    * on even ids; compression by id%3 (0 → PackBits, 1 → none, 2 →
    * LZW, with horizontal differencing on even LZW ids); 5 + id%4
    * rows per strip.
    */
  def plantPagePixels(id: Long, p: Int, w: Int, h: Int, ch: Int): Array[Byte] =
    Array.tabulate(w * h * ch)(i => ((i * 31 + i / 7 + (id + p) * 13) % 256).toByte)

  def plantPixels(id: Long, w: Int, h: Int, ch: Int): Array[Byte] =
    plantPagePixels(id, 0, w, h, ch)

  def plantDims(id: Long): (Int, Int, Int) =
    (24 + (id % 9).toInt, 16 + (id % 7).toInt, Array(1, 3, 4)((id % 3).toInt))

  def tiffFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[Multimodal.MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions(_.map { id =>
        val (w, h, ch) = plantDims(id)
        val nPages = 1 + (id % 3).toInt
        val payload = encodePages(
          (0 until nPages).map(p => (w, h, ch, plantPagePixels(id, p, w, h, ch))),
          le = id % 2 == 0,
          compression = (id % 3).toInt match {
            case 0 => 32773; case 1 => 1; case _ => 5
          },
          rowsPerStrip = 5 + (id % 4).toInt,
          predictor = if (id % 3 == 2 && id % 2 == 0) 2 else 1)
        Multimodal.MediaItem(id, s"tiff/${id % 3}", payload, w, h, nPages, 0)
      })
  }

  /** Byte-exact decode pinning (first page — the baseline image) + the
    * metadata face, page count included, in one row.
    */
  def tiffDigest(spark: SparkSession, media: Dataset[Multimodal.MediaItem]): DataFrame = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val x = meta(m.payload)
      val img = decode(m.payload)
      (m.media_id, x.byte_order, x.compression, x.n_strips,
        pageCount(m.payload), img.width, img.height, img.channels,
        java.security.MessageDigest.getInstance("MD5")
          .digest(img.pixels).map("%02x".format(_)).mkString)
    }).toDF("media_id", "byte_order", "compression", "n_strips",
      "n_pages", "width", "height", "channels", "pixel_md5")
  }
}
