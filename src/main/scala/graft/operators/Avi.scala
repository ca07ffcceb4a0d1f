package graft.operators

/** Pure-JVM AVI codec — no media library, just the RIFF chunk discipline
  * the audio tier already proved out (`Multimodal.wavFromSamples`/
  * `wavDecode`) applied to the public AVI/DIB layout: little-endian RIFF
  * 'AVI ', an 'hdrl' LIST (avih main header + one 'vids' stream's
  * strh/strf), a 'movi' LIST of one frame chunk per frame. Two pixel
  * formats:
  *
  *   - UNCOMPRESSED (BI_RGB, 24-bit): frames stored as bottom-up BGR
  *     scanlines padded to 4-byte multiples ('00db' chunks).
  *   - MJPEG ('MJPG' biCompression): each '00dc' chunk is a complete
  *     baseline JPEG ([[Jpeg]]) — the classic webcam/capture-card format,
  *     and the shape most surveillance/screen-recording crawl data
  *     arrives in. Decode accepts both full JFIF frames (what
  *     [[encodeMjpeg]] writes) and the AVI1-APP0 variant (the JPEG
  *     decoder skips unknown APPn segments by size).
  *
  * This makes the VIDEO tier stub-free end to end: canonical encoders
  * for planted fixtures and a chunk-walking decoder whose frames feed
  * the real per-frame feature/statistics pass.
  *
  * Scope (canonical subset, fails loudly outside it): one video stream,
  * BI_RGB 24-bit or MJPG, no index required, no interleaved audio. Decode
  * accepts '00db'/'00dc' frame chunks (both appear in the wild) and skips
  * unknown chunks/LISTs — including 'idx1' — by size.
  *
  * Reference behavior being matched: the reference treats blobs as opaque
  * bytes (serializers/BytesSerializer.java); media decode is a pipeline
  * extension per the brief, wire format from the public AVI/RIFF and
  * BITMAPINFOHEADER specs.
  */
object Avi {

  /** Decoded clip: frames are row-major TOP-DOWN RGB (the decoder undoes
    * the DIB bottom-up/BGR/padding storage), all `width`×`height`×3.
    */
  case class Video(width: Int, height: Int, microSecPerFrame: Int,
                   frames: IndexedSeq[Array[Byte]])

  private def fourCC(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def le32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  private def le16(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()

  /** Bytes per stored scanline: 3·width rounded up to a 4-byte multiple. */
  def strideOf(width: Int): Int = (width * 3 + 3) & ~3

  /** 'MJPG' as the little-endian biCompression / fccHandler value. */
  val MjpgFourCC: Int = 0x47504A4D

  /** Canonical encoder. `frames` are row-major top-down RGB; storage
    * converts to the DIB convention (bottom-up, BGR, padded rows). Layout:
    * RIFF('AVI ') { LIST('hdrl'){ avih, LIST('strl'){ strh, strf } },
    * LIST('movi'){ '00db'* } } — no idx1 (players tolerate its absence;
    * the decoder never needs it).
    */
  def encode(width: Int, height: Int, microSecPerFrame: Int,
             frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"Avi.encode: bad dims ${width}x$height")
    require(microSecPerFrame > 0,
      s"Avi.encode: bad frame interval $microSecPerFrame")
    frames.zipWithIndex.foreach { case (f, i) =>
      require(f.length == width * height * 3,
        s"Avi.encode: frame $i has ${f.length} bytes, want ${width * height * 3}")
    }
    val stride = strideOf(width)
    val frameBytes = stride * height

    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
      fourCC(tag) ++ le32(data.length) ++ data ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourCC(kind) ++ body)

    // advisory field; long arithmetic + clamp — a large frame times 10^6
    // overflows Int and would store garbage
    val maxBps = math.min(Int.MaxValue.toLong,
      frameBytes.toLong * 1000000L / microSecPerFrame).toInt
    val avih = le32(microSecPerFrame) ++
      le32(maxBps) ++                          // maxBytesPerSec
      le32(0) ++ le32(0) ++                   // padding, flags
      le32(frames.length) ++ le32(0) ++       // totalFrames, initialFrames
      le32(1) ++ le32(frameBytes) ++          // streams, suggestedBufferSize
      le32(width) ++ le32(height) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0) // reserved[4]
    val strh = fourCC("vids") ++ fourCC("DIB ") ++
      le32(0) ++ le16(0) ++ le16(0) ++         // flags, priority, language
      le32(0) ++                               // initialFrames
      le32(microSecPerFrame) ++ le32(1000000) ++ // scale, rate → fps = rate/scale
      le32(0) ++ le32(frames.length) ++        // start, length
      le32(frameBytes) ++ le32(-1) ++          // suggestedBufferSize, quality
      le32(0) ++                               // sampleSize
      le16(0) ++ le16(0) ++ le16(width) ++ le16(height) // rcFrame
    val strf = le32(40) ++ le32(width) ++ le32(height) ++
      le16(1) ++ le16(24) ++                   // planes, bitCount
      le32(0) ++ le32(frameBytes) ++           // BI_RGB, sizeImage
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0) // pels/meter, clrUsed/Important

    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    // stream the frame chunks into one buffer — a fold of array ++ would
    // recopy the accumulated movi body once per frame (quadratic)
    val moviBuf = new java.io.ByteArrayOutputStream(
      frames.length * (8 + frameBytes) + 16)
    frames.foreach { f =>
      val dib = new Array[Byte](frameBytes)
      var y = 0
      while (y < height) {
        val srcRow = height - 1 - y // bottom-up storage
        var x = 0
        while (x < width) {
          dib(y * stride + x * 3) = f((srcRow * width + x) * 3 + 2)     // B
          dib(y * stride + x * 3 + 1) = f((srcRow * width + x) * 3 + 1) // G
          dib(y * stride + x * 3 + 2) = f((srcRow * width + x) * 3)     // R
          x += 1
        }
        y += 1
      }
      val c = chunk("00db", dib)
      moviBuf.write(c, 0, c.length)
    }
    val movi = list("movi", moviBuf.toByteArray)

    val body = fourCC("AVI ") ++ hdrl ++ movi
    fourCC("RIFF") ++ le32(body.length) ++ body
  }

  /** MJPEG encoder: every frame compresses through [[Jpeg.encode]] and is
    * stored as its own '00dc' chunk — fccHandler and biCompression both
    * 'MJPG', biBitCount 24 (the decoded depth; the wire bytes are entropy
    * coded). `frames` are row-major top-down RGB like [[encode]]'s; the
    * JPEG layer owns the color convert, so no DIB swizzle exists on this
    * path. suggestedBufferSize is the largest encoded frame.
    */
  def encodeMjpeg(width: Int, height: Int, microSecPerFrame: Int,
                  frames: Seq[Array[Byte]], quality: Int = 75,
                  subsample: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"Avi.encodeMjpeg: bad dims ${width}x$height")
    require(microSecPerFrame > 0,
      s"Avi.encodeMjpeg: bad frame interval $microSecPerFrame")
    frames.zipWithIndex.foreach { case (f, i) =>
      require(f.length == width * height * 3,
        s"Avi.encodeMjpeg: frame $i has ${f.length} bytes, want ${width * height * 3}")
    }
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
      fourCC(tag) ++ le32(data.length) ++ data ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourCC(kind) ++ body)

    val encoded = frames.map(f =>
      Jpeg.encode(width, height, 3, f, quality = quality, subsample = subsample))
    val bufSize = if (encoded.isEmpty) 0 else encoded.map(_.length).max
    val maxBps = math.min(Int.MaxValue.toLong,
      bufSize.toLong * 1000000L / microSecPerFrame).toInt
    val avih = le32(microSecPerFrame) ++
      le32(maxBps) ++
      le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++
      le32(1) ++ le32(bufSize) ++
      le32(width) ++ le32(height) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fourCC("vids") ++ fourCC("MJPG") ++
      le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++
      le32(microSecPerFrame) ++ le32(1000000) ++
      le32(0) ++ le32(frames.length) ++
      le32(bufSize) ++ le32(-1) ++
      le32(0) ++
      le16(0) ++ le16(0) ++ le16(width) ++ le16(height)
    val strf = le32(40) ++ le32(width) ++ le32(height) ++
      le16(1) ++ le16(24) ++
      le32(MjpgFourCC) ++ le32(0) ++       // biCompression, biSizeImage (varies per frame)
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviBuf = new java.io.ByteArrayOutputStream(
      encoded.map(e => 8 + e.length + (e.length & 1)).sum + 16)
    encoded.foreach { e =>
      val c = chunk("00dc", e)
      moviBuf.write(c, 0, c.length)
    }
    val movi = list("movi", moviBuf.toByteArray)
    val body = fourCC("AVI ") ++ hdrl ++ movi
    fourCC("RIFF") ++ le32(body.length) ++ body
  }

  /** Parsed container: header fields + (offset, length) of each RAW movi
    * frame chunk inside the payload (DIB scanlines or standalone JPEGs —
    * neither copied nor pixel-converted yet, so strided consumers never
    * touch an unsampled frame's bytes at all).
    */
  private case class Parsed(payload: Array[Byte], width: Int, height: Int,
                            uspf: Int, bitCount: Int, compression: Int,
                            raw: IndexedSeq[(Int, Int)])

  private def parse(payload: Array[Byte]): Parsed = {
    require(payload.length >= 12, "Avi.decode: payload too short for RIFF header")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(at: Int): String = new String(payload, at, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "AVI ",
      "Avi.decode: not an AVI payload (bad RIFF/AVI signature)")
    var width = -1; var height = -1; var uspf = -1
    var bitCount = -1; var compression = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var sawMovi = false

    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var pos = from
      while (pos.toLong + 8 <= to) {
        val ct = tag(pos)
        val len = bb.getInt(pos + 4)
        require(len >= 0 && pos.toLong + 8L + len <= to,
          s"Avi.decode: chunk '$ct' at $pos overruns its parent")
        ct match {
          case "LIST" =>
            require(len >= 4, s"Avi.decode: LIST at $pos too short for a kind")
            val kind = tag(pos + 8)
            if (kind == "movi") { sawMovi = true; walk(pos + 12, pos + 8 + len, inMovi = true) }
            else if (kind == "hdrl" || kind == "strl")
              walk(pos + 12, pos + 8 + len, inMovi = false)
            // other LISTs (INFO, ...) skip whole
          case "avih" =>
            require(len >= 40, "Avi.decode: avih too short")
            uspf = bb.getInt(pos + 8)
            width = bb.getInt(pos + 8 + 32)
            height = bb.getInt(pos + 8 + 36)
          case "strf" =>
            require(len >= 40, "Avi.decode: strf too short for BITMAPINFOHEADER")
            bitCount = bb.getShort(pos + 8 + 14) & 0xffff
            compression = bb.getInt(pos + 8 + 16)
          case "00db" | "00dc" if inMovi =>
            frames += ((pos + 8, len))
          case _ => // strh, idx1, JUNK, vendor chunks: skip by size
        }
        pos += 8 + len + (len & 1) // RIFF chunks pad to even offsets
      }
    }
    walk(12, math.min(payload.length.toLong, 8L + bb.getInt(4)).toInt, inMovi = false)
    require(width > 0 && height > 0 && uspf > 0,
      "Avi.decode: missing or degenerate avih header")
    require(sawMovi, "Avi.decode: missing movi LIST")
    if (compression != MjpgFourCC) {
      require(compression == 0,
        f"Avi.decode: compressed stream (biCompression 0x$compression%08X) not " +
          "supported (BI_RGB and MJPG only)")
      require(bitCount == 24,
        s"Avi.decode: $bitCount-bit frames not supported (24-bit BI_RGB only)")
    }
    Parsed(payload, width, height, uspf, bitCount, compression, frames.toIndexedSeq)
  }

  /** One frame → top-down RGB: the DIB unswizzle (bottom-up/BGR/padded)
    * or, for MJPEG, the standalone JPEG decode with gray→RGB expansion
    * (grayscale frames are legal MJPEG) and a dims-vs-header check.
    */
  private def frameToRgb(p: Parsed, i: Int): Array[Byte] = {
    val (off, len) = p.raw(i)
    if (p.compression == MjpgFourCC) {
      val img = Jpeg.decode(java.util.Arrays.copyOfRange(p.payload, off, off + len))
      require(img.width == p.width && img.height == p.height,
        s"Avi.decode: MJPEG frame $i is ${img.width}x${img.height}, " +
          s"header says ${p.width}x${p.height}")
      if (img.channels == 3) img.pixels
      else {
        val rgb = new Array[Byte](p.width * p.height * 3)
        var q = 0
        while (q < p.width * p.height) {
          rgb(q * 3) = img.pixels(q); rgb(q * 3 + 1) = img.pixels(q)
          rgb(q * 3 + 2) = img.pixels(q)
          q += 1
        }
        rgb
      }
    } else {
      val stride = strideOf(p.width)
      require(len == stride * p.height,
        s"Avi.decode: frame $i has $len bytes, want ${stride * p.height}")
      val dib = p.payload
      val rgb = new Array[Byte](p.width * p.height * 3)
      var y = 0
      while (y < p.height) {
        val srcRow = off + (p.height - 1 - y) * stride
        var x = 0
        while (x < p.width) {
          rgb((y * p.width + x) * 3) = dib(srcRow + x * 3 + 2)     // R
          rgb((y * p.width + x) * 3 + 1) = dib(srcRow + x * 3 + 1) // G
          rgb((y * p.width + x) * 3 + 2) = dib(srcRow + x * 3)     // B
          x += 1
        }
        y += 1
      }
      rgb
    }
  }

  /** REAL decoder: RIFF walk (long-arithmetic bounds like wavDecode — a
    * crafted 32-bit size cannot wrap the check), avih/strh/strf parse with
    * loud rejection outside the BI_RGB/MJPG subset, '00db'/'00dc' frame
    * collection from the 'movi' LIST, and per-frame pixel conversion
    * ([[frameToRgb]]). Unknown chunks and LISTs skip by size.
    */
  def decode(payload: Array[Byte]): Video = {
    val p = parse(payload)
    Video(p.width, p.height, p.uspf, p.raw.indices.map(frameToRgb(p, _)))
  }

  /** Strided decode — the sampling fast path: parses the container once
    * and pixel-converts ONLY frames 0, stride, 2·stride, …. For MJPEG
    * this skips the Huffman+IDCT work on every unsampled frame entirely
    * (at stride s, ~1/s of the decode cost); frame chunks are
    * independent, so skipping is exact, not approximate. Returns
    * (width, height, totalFrames, sampled (index, topDownRgb) pairs).
    */
  def decodeStrided(payload: Array[Byte], stride: Int): (Int, Int, Int, IndexedSeq[(Int, Array[Byte])]) = {
    require(stride >= 1, s"Avi.decodeStrided: stride must be >= 1, got $stride")
    val p = parse(payload)
    (p.width, p.height, p.raw.length,
      (0 until p.raw.length by stride).map(i => (i, frameToRgb(p, i))))
  }
}
