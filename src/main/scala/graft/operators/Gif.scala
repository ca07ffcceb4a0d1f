package graft.operators

/** Pure-JVM GIF codec (GIF89a, the third crawl image container and the
  * web's de-facto short-animation format). Like [[Png]]/[[Jpeg]], the
  * encoder exists to plant REAL containers for fixtures; the decoder is
  * the production path. GIF is lossless on its palette indices, so the
  * fixture replica re-derives palette lookup + frame composition as pure
  * functions of the planted formulas with no GIF round trip — oracle
  * agreement proves LZW + sub-block framing + interlace + composition
  * are exactly right.
  *
  * Scope: GIF87a/89a headers; global and local color tables; interlaced
  * and sequential frames; sub-rectangle frames; graphic-control
  * extensions (transparency index, disposal methods 0-3, delay);
  * comment/application/plain-text extensions skipped; real LZW both
  * directions (variable 3..12-bit codes, LSB-first packing, CLEAR on
  * dictionary overflow, the KwKwK case). Corrupt streams and unknown
  * blocks reject by name.
  *
  * ANIMATION COMPOSITION CONTRACT (pinned; the fixture-replica spec):
  * the canvas starts as the background color (global table entry
  * `bgIndex`, black if the table is absent); each frame draws its
  * non-transparent indices into its rectangle (local table if present,
  * else global); the composed canvas snapshots as a top-down RGB frame
  * AFTER each draw; then disposal applies for the next frame — 0/1 keep,
  * 2 restores the frame's rectangle to the background color, 3 restores
  * the canvas saved before the draw.
  *
  * Reference behavior being matched: blobs are opaque bytes in the
  * reference (serializers/BytesSerializer.java); decode is a pipeline
  * extension per the brief, wire format from the public GIF89a spec.
  */
object Gif {

  /** Decoded animation: composed top-down RGB frames over the logical
    * screen, plus each frame's delay in centiseconds (0 for stills).
    */
  case class Anim(width: Int, height: Int,
                  frames: IndexedSeq[Array[Byte]], delaysCs: IndexedSeq[Int])

  /** One frame to encode: palette indices for a rectangle of the screen.
    * `transparent` marks one index as see-through; `disposal` 0-3 per the
    * composition contract; `interlace` stores rows in the 4-pass order.
    */
  case class FrameSpec(left: Int, top: Int, width: Int, height: Int,
                       indices: Array[Byte], delayCs: Int = 4,
                       transparent: Option[Int] = None, disposal: Int = 1,
                       interlace: Boolean = false,
                       localPalette: Option[Array[Byte]] = None)

  /** The 4-pass interlace row schedule: source row order for a height. */
  private def interlaceRows(h: Int): IndexedSeq[Int] =
    (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)

  // ── LZW (GIF variant: LSB-first bit packing, 3..12-bit codes) ────────

  private final class LzwWriter(minCodeSize: Int,
                                out: java.io.ByteArrayOutputStream) {
    private val data = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    private var width = minCodeSize + 1
    val clearCode: Int = 1 << minCodeSize
    val endCode: Int = clearCode + 1
    private var next = endCode + 1
    // dictionary: (prefix code, appended symbol) → code
    private var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]

    def put(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) {
        data.write((acc & 0xff).toInt)
        acc >>>= 8; nbits -= 8
      }
    }
    def reset(): Unit = { dict.clear(); next = endCode + 1; width = minCodeSize + 1 }
    def lookup(prefix: Int, sym: Int): Option[Int] = dict.get((prefix, sym))
    /** Register prefix+sym, or emit CLEAR and reset when the dictionary
      * is full (entry values stop at 4095). The encoder widens one entry
      * LATER than the decoder (next == 2^w + 1 vs 2^w) because the
      * decoder's dictionary lags one entry behind.
      */
    def register(prefix: Int, sym: Int): Unit = {
      if (next == 4096) { put(clearCode); reset() }
      else {
        dict((prefix, sym)) = next
        next += 1
        if (next == (1 << width) + 1 && width < 12) width += 1
      }
    }
    def finish(): Unit = {
      // endgame width sync: the decoder's dictionary registrations lag
      // one code behind the encoder's, which the in-stream bump rule
      // (next == 2^w + 1) compensates — but by END-code time the decoder
      // has caught up, so when the entry count sits exactly at 2^w the
      // decoder reads END one bit wider; mirror its bump here
      if (next == (1 << width) && width < 12) width += 1
      put(endCode)
      if (nbits > 0) data.write((acc & 0xff).toInt)
      // sub-block framing: ≤255-byte chunks, zero terminator
      val bytes = data.toByteArray
      var off = 0
      while (off < bytes.length) {
        val n = math.min(255, bytes.length - off)
        out.write(n)
        out.write(bytes, off, n)
        off += n
      }
      out.write(0)
    }
  }

  /** LZW-compress one frame's index stream into sub-blocks. */
  private def lzwEncode(minCodeSize: Int, indices: Array[Byte],
                        out: java.io.ByteArrayOutputStream): Unit = {
    out.write(minCodeSize)
    val w = new LzwWriter(minCodeSize, out)
    w.put(w.clearCode)
    var prefix = -1
    var i = 0
    while (i < indices.length) {
      val sym = indices(i) & 0xff
      require(sym < w.clearCode,
        s"Gif.encode: index $sym exceeds the $minCodeSize-bit palette")
      if (prefix < 0) prefix = sym
      else w.lookup(prefix, sym) match {
        case Some(code) => prefix = code
        case None =>
          w.put(prefix)
          w.register(prefix, sym)
          prefix = sym
      }
      i += 1
    }
    if (prefix >= 0) w.put(prefix)
    w.finish()
  }

  /** Decode one image block's LZW stream (already de-sub-blocked). */
  private def lzwDecode(minCodeSize: Int, data: Array[Byte],
                        expected: Int): Array[Byte] = {
    val clearCode = 1 << minCodeSize
    val endCode = clearCode + 1
    val out = new Array[Byte](expected)
    var outLen = 0
    // dictionary as (prefix code, tail symbol); roots are implicit
    val prefixOf = new Array[Int](4096)
    val tailOf = new Array[Int](4096)
    var next = endCode + 1
    var width = minCodeSize + 1
    var acc = 0L; var nbits = 0; var pos = 0
    var prev = -1
    def emit(code: Int): Int = { // writes the string of `code`, returns its head symbol
      var c = code
      var n = 0
      while (c >= clearCode + 2) { n += 1; c = prefixOf(c) } // count depth
      val head = c
      // write backwards: walk again filling from the end
      var idx = outLen + n
      require(idx < expected, "Gif.decode: LZW output overruns the frame")
      c = code
      while (c >= clearCode + 2) {
        out(idx) = tailOf(c).toByte; idx -= 1; c = prefixOf(c)
      }
      out(idx) = c.toByte
      outLen += n + 1
      head
    }
    var done = false
    while (!done) {
      while (nbits < width && pos < data.length) {
        acc |= (data(pos) & 0xffL) << nbits
        nbits += 8; pos += 1
      }
      require(nbits >= width, "Gif.decode: LZW stream truncated")
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nbits -= width
      if (code == clearCode) {
        next = endCode + 1; width = minCodeSize + 1; prev = -1
      } else if (code == endCode) done = true
      else {
        require(code < next || (code == next && prev >= 0),
          s"Gif.decode: LZW code $code outside the dictionary")
        require(outLen < expected, "Gif.decode: LZW output overruns the frame")
        val head =
          if (code == next) { // KwKwK: string = prev-string + its own head
            val h = emit(prev)
            require(outLen < expected, "Gif.decode: LZW output overruns the frame")
            out(outLen) = h.toByte; outLen += 1
            h
          } else emit(code)
        if (prev >= 0 && next < 4096) {
          prefixOf(next) = prev; tailOf(next) = head
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    require(outLen == expected,
      s"Gif.decode: LZW yielded $outLen of $expected pixels")
    out
  }

  // ── encoder ──────────────────────────────────────────────────────────

  private def paletteBits(nColors: Int): Int = {
    require(nColors >= 2 && nColors <= 256, s"Gif.encode: palette size $nColors")
    var b = 1
    while ((1 << b) < nColors) b += 1
    math.max(b, 2) // GIF's minimum LZW code size is 2
  }

  /** GIF89a encoder: logical screen + global palette (RGB triples), then
    * one image block per frame (GCE first when transparency/delay/
    * disposal apply — always written for uniformity).
    */
  def encode(width: Int, height: Int, globalPalette: Array[Byte],
             frames: Seq[FrameSpec], bgIndex: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"Gif.encode: bad dims ${width}x$height")
    require(globalPalette.length % 3 == 0, "Gif.encode: palette must be RGB triples")
    require(frames.nonEmpty, "Gif.encode: no frames")
    val nColors = globalPalette.length / 3
    val bits = paletteBits(nColors)
    val tableSize = 1 << bits
    val out = new java.io.ByteArrayOutputStream(4096)
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0x80 | (bits - 1) << 4 | (bits - 1)) // GCT present, size
    out.write(bgIndex); out.write(0) // background index, no aspect ratio
    (0 until tableSize * 3).foreach { k =>
      out.write(if (k < globalPalette.length) globalPalette(k) & 0xff else 0)
    }
    frames.foreach { f =>
      require(f.left >= 0 && f.top >= 0 && f.left + f.width <= width &&
        f.top + f.height <= height, s"Gif.encode: frame rect out of bounds")
      require(f.indices.length == f.width * f.height,
        s"Gif.encode: expected ${f.width * f.height} indices, got ${f.indices.length}")
      require(f.disposal >= 0 && f.disposal <= 3,
        s"Gif.encode: disposal ${f.disposal} out of range")
      // graphic control extension
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((f.disposal << 2) | (if (f.transparent.isDefined) 1 else 0))
      out.write(f.delayCs & 0xff); out.write((f.delayCs >> 8) & 0xff)
      out.write(f.transparent.getOrElse(0)); out.write(0)
      // image descriptor
      out.write(0x2c)
      out.write(f.left & 0xff); out.write((f.left >> 8) & 0xff)
      out.write(f.top & 0xff); out.write((f.top >> 8) & 0xff)
      out.write(f.width & 0xff); out.write((f.width >> 8) & 0xff)
      out.write(f.height & 0xff); out.write((f.height >> 8) & 0xff)
      val lct = f.localPalette
      val lctBits = lct.map(p => paletteBits(p.length / 3))
      out.write((if (lct.isDefined) 0x80 else 0) |
        (if (f.interlace) 0x40 else 0) |
        lctBits.map(_ - 1).getOrElse(0))
      lct.foreach { p =>
        val sz = 1 << lctBits.get
        (0 until sz * 3).foreach(k => out.write(if (k < p.length) p(k) & 0xff else 0))
      }
      val codeBits = lctBits.getOrElse(bits)
      val stored =
        if (!f.interlace) f.indices
        else {
          val o = new Array[Byte](f.indices.length)
          interlaceRows(f.height).zipWithIndex.foreach { case (srcRow, at) =>
            System.arraycopy(f.indices, srcRow * f.width, o, at * f.width, f.width)
          }
          o
        }
      lzwEncode(codeBits, stored, out)
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ── decoder ──────────────────────────────────────────────────────────

  /** REAL decoder: header + logical screen, GCT/LCT, extension skip,
    * per-frame LZW decode (sub-block reassembly, interlace undo), and the
    * pinned composition of every frame into top-down RGB snapshots.
    */
  def decode(payload: Array[Byte]): Anim = {
    require(payload.length >= 13, "Gif.decode: payload too short for a GIF header")
    val sig = new String(payload, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a",
      s"Gif.decode: not a GIF payload (header '$sig')")
    def u16(p: Int): Int = (payload(p) & 0xff) | ((payload(p + 1) & 0xff) << 8)
    val width = u16(6); val height = u16(8)
    require(width > 0 && height > 0, s"Gif.decode: bad dims ${width}x$height")
    val flags = payload(10) & 0xff
    val bgIndex = payload(11) & 0xff
    var pos = 13
    val gct: Array[Byte] =
      if ((flags & 0x80) != 0) {
        val sz = 1 << ((flags & 7) + 1)
        require(pos + sz * 3 <= payload.length, "Gif.decode: truncated global color table")
        val t = java.util.Arrays.copyOfRange(payload, pos, pos + sz * 3)
        pos += sz * 3
        t
      } else null

    // composition canvas starts as the background color
    val canvas = new Array[Byte](width * height * 3)
    if (gct != null && bgIndex * 3 + 2 < gct.length) {
      var i = 0
      while (i < width * height) {
        canvas(i * 3) = gct(bgIndex * 3)
        canvas(i * 3 + 1) = gct(bgIndex * 3 + 1)
        canvas(i * 3 + 2) = gct(bgIndex * 3 + 2)
        i += 1
      }
    }
    val frames = IndexedSeq.newBuilder[Array[Byte]]
    val delays = IndexedSeq.newBuilder[Int]
    // pending graphic-control state for the next image block
    var transparent = -1
    var disposal = 0
    var delayCs = 0
    var done = false
    var nFrames = 0
    while (!done) {
      require(pos < payload.length, "Gif.decode: ran off the payload before the trailer")
      (payload(pos) & 0xff) match {
        case 0x3b => done = true
        case 0x21 =>
          val label = payload(pos + 1) & 0xff
          if (label == 0xf9) {
            require((payload(pos + 2) & 0xff) == 4, "Gif.decode: bad GCE block size")
            val packed = payload(pos + 3) & 0xff
            disposal = (packed >> 2) & 7
            require(disposal <= 3,
              s"Gif.decode: disposal method $disposal not supported")
            delayCs = u16(pos + 4)
            transparent = if ((packed & 1) != 0) payload(pos + 6) & 0xff else -1
            pos += 7
            require((payload(pos) & 0xff) == 0, "Gif.decode: unterminated GCE")
            pos += 1
          } else {
            // comment / application / plain text: skip sub-blocks
            pos += 2
            while ((payload(pos) & 0xff) != 0) {
              pos += 1 + (payload(pos) & 0xff)
              require(pos < payload.length, "Gif.decode: truncated extension")
            }
            pos += 1
          }
        case 0x2c =>
          val left = u16(pos + 1); val top = u16(pos + 3)
          val fw = u16(pos + 5); val fh = u16(pos + 7)
          require(fw > 0 && fh > 0 && left + fw <= width && top + fh <= height,
            s"Gif.decode: frame rect ${fw}x$fh at ($left,$top) outside ${width}x$height")
          val iflags = payload(pos + 9) & 0xff
          pos += 10
          val lct: Array[Byte] =
            if ((iflags & 0x80) != 0) {
              val sz = 1 << ((iflags & 7) + 1)
              require(pos + sz * 3 <= payload.length, "Gif.decode: truncated local color table")
              val t = java.util.Arrays.copyOfRange(payload, pos, pos + sz * 3)
              pos += sz * 3
              t
            } else null
          val palette = if (lct != null) lct else gct
          require(palette != null, "Gif.decode: frame without any color table")
          val interlaced = (iflags & 0x40) != 0
          val minCodeSize = payload(pos) & 0xff
          require(minCodeSize >= 2 && minCodeSize <= 11,
            s"Gif.decode: LZW minimum code size $minCodeSize out of range")
          pos += 1
          // reassemble sub-blocks
          val data = new java.io.ByteArrayOutputStream(1024)
          while ((payload(pos) & 0xff) != 0) {
            val n = payload(pos) & 0xff
            require(pos + 1 + n <= payload.length, "Gif.decode: truncated image data")
            data.write(payload, pos + 1, n)
            pos += 1 + n
          }
          pos += 1
          var indices = lzwDecode(minCodeSize, data.toByteArray, fw * fh)
          if (interlaced) {
            val o = new Array[Byte](indices.length)
            interlaceRows(fh).zipWithIndex.foreach { case (dstRow, at) =>
              System.arraycopy(indices, at * fw, o, dstRow * fw, fw)
            }
            indices = o
          }
          // compose: draw non-transparent pixels, snapshot, then dispose
          val saved = if (disposal == 3) canvas.clone() else null
          var y = 0
          while (y < fh) {
            var x = 0
            while (x < fw) {
              val idx = indices(y * fw + x) & 0xff
              if (idx != transparent) {
                require(idx * 3 + 2 < palette.length,
                  s"Gif.decode: index $idx outside the ${palette.length / 3}-entry palette")
                val o = ((top + y) * width + left + x) * 3
                canvas(o) = palette(idx * 3)
                canvas(o + 1) = palette(idx * 3 + 1)
                canvas(o + 2) = palette(idx * 3 + 2)
              }
              x += 1
            }
            y += 1
          }
          frames += canvas.clone()
          delays += delayCs
          nFrames += 1
          disposal match {
            case 2 => // restore the rectangle to the background color
              val (br, bg2, bb) =
                if (gct != null && bgIndex * 3 + 2 < gct.length)
                  (gct(bgIndex * 3), gct(bgIndex * 3 + 1), gct(bgIndex * 3 + 2))
                else (0.toByte, 0.toByte, 0.toByte)
              var yy = 0
              while (yy < fh) {
                var xx = 0
                while (xx < fw) {
                  val o = ((top + yy) * width + left + xx) * 3
                  canvas(o) = br; canvas(o + 1) = bg2; canvas(o + 2) = bb
                  xx += 1
                }
                yy += 1
              }
            case 3 => System.arraycopy(saved, 0, canvas, 0, canvas.length)
            case _ => ()
          }
          transparent = -1; disposal = 0; delayCs = 0
        case b =>
          throw new IllegalArgumentException(
            f"Gif.decode: unknown block 0x$b%02X at $pos")
      }
    }
    require(nFrames > 0, "Gif.decode: no image blocks before the trailer")
    Anim(width, height, frames.result(), delays.result())
  }

  /** First composed frame as a still image (the image-column face). */
  def decodeImage(payload: Array[Byte]): Png.Image = {
    val anim = decode(payload)
    Png.Image(anim.width, anim.height, 3, anim.frames.head)
  }
}
