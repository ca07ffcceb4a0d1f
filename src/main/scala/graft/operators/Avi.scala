package graft.operators

/** Pure-JVM AVI codec for UNCOMPRESSED (BI_RGB, 24-bit) video — no media
  * library, just the RIFF chunk discipline the audio tier already proved
  * out (`Multimodal.wavFromSamples`/`wavDecode`) applied to the public
  * AVI/DIB layout: little-endian RIFF 'AVI ', an 'hdrl' LIST (avih main
  * header + one 'vids' stream's strh/strf), a 'movi' LIST of one '00db'
  * chunk per frame, frames stored as bottom-up BGR scanlines padded to
  * 4-byte multiples. This makes the VIDEO tier stub-free end to end: a
  * canonical encoder for planted fixtures and a chunk-walking decoder
  * whose frames feed the real per-frame feature/statistics pass.
  *
  * Scope (canonical subset, fails loudly outside it): one video stream,
  * BI_RGB 24-bit, no index required, no interleaved audio. Decode accepts
  * '00db'/'00dc' frame chunks (both appear in the wild for uncompressed
  * streams) and skips unknown chunks/LISTs — including 'idx1' — by size.
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

  /** REAL decoder: RIFF walk (long-arithmetic bounds like wavDecode — a
    * crafted 32-bit size cannot wrap the check), avih/strh/strf parse with
    * loud rejection of compressed or non-24-bit streams, '00db'/'00dc'
    * frame collection from the 'movi' LIST, and the bottom-up/BGR/padded →
    * top-down RGB unswizzle. Unknown chunks and LISTs skip by size.
    */
  def decode(payload: Array[Byte]): Video = {
    require(payload.length >= 12, "Avi.decode: payload too short for RIFF header")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(at: Int): String = new String(payload, at, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "AVI ",
      "Avi.decode: not an AVI payload (bad RIFF/AVI signature)")
    var width = -1; var height = -1; var uspf = -1
    var bitCount = -1; var compression = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
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
            frames += payload.slice(pos + 8, pos + 8 + len)
          case _ => // strh, idx1, JUNK, vendor chunks: skip by size
        }
        pos += 8 + len + (len & 1) // RIFF chunks pad to even offsets
      }
    }
    walk(12, math.min(payload.length.toLong, 8L + bb.getInt(4)).toInt, inMovi = false)
    require(width > 0 && height > 0 && uspf > 0,
      "Avi.decode: missing or degenerate avih header")
    require(sawMovi, "Avi.decode: missing movi LIST")
    require(compression == 0,
      s"Avi.decode: compressed stream (biCompression $compression) not supported " +
        "(uncompressed BI_RGB only)")
    require(bitCount == 24,
      s"Avi.decode: $bitCount-bit frames not supported (24-bit BI_RGB only)")
    val stride = strideOf(width)
    val out = frames.zipWithIndex.map { case (dib, i) =>
      require(dib.length == stride * height,
        s"Avi.decode: frame $i has ${dib.length} bytes, want ${stride * height}")
      val rgb = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = height - 1 - y
        var x = 0
        while (x < width) {
          rgb((y * width + x) * 3) = dib(srcRow * stride + x * 3 + 2)     // R
          rgb((y * width + x) * 3 + 1) = dib(srcRow * stride + x * 3 + 1) // G
          rgb((y * width + x) * 3 + 2) = dib(srcRow * stride + x * 3)     // B
          x += 1
        }
        y += 1
      }
      rgb
    }
    Video(width, height, uspf, out.toIndexedSeq)
  }
}
