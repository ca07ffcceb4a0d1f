package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec — no image library, just `java.util.zip` (DEFLATE)
  * plus the PNG spec's five scanline filters. This is what makes the image
  * tier stub-free end to end: a real canonical encoder for planted
  * fixtures (the image analog of `Multimodal.wavFromSamples`) and a real
  * chunk-walking, CRC-verifying decoder whose defiltered pixels feed real
  * resize/feature extraction.
  *
  * Scope: the encoder writes the canonical 8-bit gray/RGB/RGBA subset;
  * the decoder additionally accepts the common web variants — PALETTE
  * images (color type 3, 8-bit indices, PLTE→RGB with tRNS→RGBA) and
  * 16-BIT depths (defiltered at the full pixel stride, reduced to the
  * high byte). Interlace and sub-byte palette packing fail loudly. All
  * five filter types (None/Sub/Up/Average/Paeth) encode AND decode — the
  * planted fixtures rotate filters per scanline so every defilter path
  * sits inside the oracle gate, not just the spec suite.
  *
  * Reference behavior being matched: the reference treats blobs as opaque
  * bytes (cql3/Constants; serializers/BytesSerializer.java) — media decode
  * is a pipeline extension per the brief, with the wire format from the
  * public PNG spec (RFC 2083).
  */
object Png {

  /** Decoded image: row-major, channel-interleaved 8-bit samples. */
  case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private val signature = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def colorTypeOf(channels: Int): Int = channels match {
    case 1 => 0
    case 3 => 2
    case 4 => 6
    case c => throw new IllegalArgumentException(
      s"Png.encode: unsupported channel count $c (1 = gray, 3 = RGB, 4 = RGBA)")
  }

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 6 => 4
    case t => throw new IllegalArgumentException(
      s"Png.decode: unsupported color type $t (gray/RGB/RGBA only; no palette)")
  }

  /** Paeth predictor (PNG spec §6.6) — exact integer arithmetic. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Canonical encoder. `filterOf(y)` picks the scanline filter (0-4);
    * default None everywhere. Output layout: signature, IHDR, one IDAT
    * (best-compression DEFLATE), IEND — each chunk CRC'd.
    */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
             filterOf: Int => Int = _ => 0): Array[Byte] = {
    require(width > 0 && height > 0, s"Png.encode: bad dims ${width}x$height")
    val ct = colorTypeOf(channels)
    val rowLen = width * channels
    require(pixels.length == rowLen * height,
      s"Png.encode: expected ${rowLen * height} samples, got ${pixels.length}")

    // filter the scanlines into the raw DEFLATE input
    val raw = new Array[Byte](height * (1 + rowLen))
    var y = 0
    while (y < height) {
      val f = filterOf(y)
      require(f >= 0 && f <= 4, s"Png.encode: filter $f out of range at row $y")
      val ro = y * (1 + rowLen)
      raw(ro) = f.toByte
      var i = 0
      while (i < rowLen) {
        val x = pixels(y * rowLen + i) & 0xff
        val a = if (i >= channels) pixels(y * rowLen + i - channels) & 0xff else 0
        val b = if (y > 0) pixels((y - 1) * rowLen + i) & 0xff else 0
        val c = if (y > 0 && i >= channels) pixels((y - 1) * rowLen + i - channels) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        raw(ro + 1 + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }

    val deflater = new Deflater(Deflater.BEST_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()

    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(ct.toByte)          // bit depth, color type
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive filter, no interlace
      .array()
    val out = new java.io.ByteArrayOutputStream(zbuf.size() + 64)
    out.write(signature, 0, signature.length)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", zbuf.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, tag: String,
                         data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len, 0, 4)
    val tb = tag.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
  }

  /** REAL decoder: signature + chunk walk (every chunk CRC-verified, a
    * corrupt payload fails loudly rather than yielding garbage pixels),
    * multi-IDAT concatenation, INFLATE, and per-scanline defilter of all
    * five filter types. Accepts the common web variants — 8-bit
    * gray/RGB/RGBA, PALETTE (color type 3 with 8-bit indices; PLTE
    * expanded to RGB, tRNS to RGBA), and 16-BIT depths (defiltered at
    * the 2-byte-per-sample stride, then reduced to the high byte, the
    * standard 16→8 conversion). Interlace, sub-byte palette indices and
    * other exotics reject by name — a silent partial decode would poison
    * every downstream feature.
    */
  def decode(payload: Array[Byte]): Image = {
    require(payload.length >= 8 && signature.indices.forall(i => payload(i) == signature(i)),
      "Png.decode: not a PNG payload (bad signature)")
    val bb = java.nio.ByteBuffer.wrap(payload) // big-endian by default
    var pos = 8
    var width = -1; var height = -1; var colorType = -1; var depth = -1
    var plte: Array[Byte] = null
    var trns: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(pos.toLong + 8 <= payload.length, "Png.decode: truncated chunk header")
      val len = bb.getInt(pos)
      // long arithmetic: a crafted len near Int.MaxValue would wrap the
      // int-typed bound check (same hardening as wavDecode)
      require(len >= 0 && pos.toLong + 12L + len <= payload.length,
        s"Png.decode: chunk at $pos overruns the payload")
      val tag = new String(payload, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(payload, pos + 4, 4 + len)
      require(crc.getValue.toInt == bb.getInt(pos + 8 + len),
        s"Png.decode: CRC mismatch in chunk '$tag'")
      tag match {
        case "IHDR" =>
          width = bb.getInt(pos + 8); height = bb.getInt(pos + 12)
          require(width > 0 && height > 0, s"Png.decode: bad dims ${width}x$height")
          depth = bb.get(pos + 16) & 0xff
          colorType = bb.get(pos + 17) & 0xff
          require(Set(0, 2, 3, 6).contains(colorType),
            s"Png.decode: unsupported color type $colorType " +
              "(gray/RGB/palette/RGBA only)")
          if (colorType == 3)
            require(depth == 8, s"Png.decode: only 8-bit palette indices " +
              s"supported (got $depth-bit — sub-byte packing not implemented)")
          else
            require(depth == 8 || depth == 16,
              s"Png.decode: only 8/16-bit depths supported, got $depth")
          require(bb.get(pos + 18) == 0 && bb.get(pos + 19) == 0,
            "Png.decode: unknown compression/filter method")
          require(bb.get(pos + 20) == 0, "Png.decode: interlaced PNGs not supported")
        case "PLTE" =>
          require(len % 3 == 0 && len > 0 && len <= 768,
            s"Png.decode: PLTE length $len is not a palette")
          plte = payload.slice(pos + 8, pos + 8 + len)
        case "tRNS" if colorType == 3 =>
          trns = payload.slice(pos + 8, pos + 8 + len)
        case "IDAT" => idat.write(payload, pos + 8, len)
        case "IEND" => done = true
        case _ => // ancillary chunks (tEXt, gAMA, ...) skip
      }
      pos += 12 + len
    }
    require(width > 0, "Png.decode: missing IHDR chunk")
    require(idat.size() > 0, "Png.decode: missing IDAT chunk")
    if (colorType == 3)
      require(plte != null, "Png.decode: palette image without a PLTE chunk")

    // stored stream geometry: bytes per sample × samples per pixel
    val storedChannels = if (colorType == 3) 1 else channelsOf(colorType)
    val bytesPerSample = if (depth == 16) 2 else 1
    val bpp = storedChannels * bytesPerSample
    val rowLen = width * bpp
    val raw = new Array[Byte](height * (1 + rowLen))
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      require(n > 0 || inflater.finished(),
        "Png.decode: DEFLATE stream stalled (corrupt or truncated IDAT)")
      off += n
    }
    inflater.end()
    require(off == raw.length,
      s"Png.decode: expected ${raw.length} raw bytes, inflated $off")

    // defilter at the byte level with the FULL bytes-per-pixel offset
    // (PNG filters treat the 2-byte samples of 16-bit images as bytes,
    // with the left neighbor one whole pixel back)
    val px = new Array[Byte](height * rowLen)
    var y = 0
    while (y < height) {
      val f = raw(y * (1 + rowLen)) & 0xff
      require(f <= 4, s"Png.decode: unknown filter type $f at row $y")
      val ro = y * (1 + rowLen) + 1
      var i = 0
      while (i < rowLen) {
        val v = raw(ro + i) & 0xff
        val a = if (i >= bpp) px(y * rowLen + i - bpp) & 0xff else 0
        val b = if (y > 0) px((y - 1) * rowLen + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) px((y - 1) * rowLen + i - bpp) & 0xff else 0
        val x = f match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + (a + b) / 2
          case 4 => v + paeth(a, b, c)
        }
        px(y * rowLen + i) = (x & 0xff).toByte
        i += 1
      }
      y += 1
    }

    if (colorType == 3) {
      // palette expansion: index → PLTE triple; a tRNS chunk upgrades the
      // output to RGBA (absent entries default opaque, per the spec)
      val nEntries = plte.length / 3
      val outCh = if (trns != null) 4 else 3
      val out = new Array[Byte](width * height * outCh)
      var k = 0
      while (k < width * height) {
        val idx = px(k) & 0xff
        require(idx < nEntries,
          s"Png.decode: palette index $idx outside the $nEntries-entry PLTE")
        out(k * outCh) = plte(idx * 3)
        out(k * outCh + 1) = plte(idx * 3 + 1)
        out(k * outCh + 2) = plte(idx * 3 + 2)
        if (outCh == 4)
          out(k * outCh + 3) =
            if (idx < trns.length) trns(idx) else 255.toByte
        k += 1
      }
      Image(width, height, outCh, out)
    } else if (depth == 16) {
      // 16→8: keep each sample's high byte (the spec's recommended
      // reduction; exact for images that were 8-bit scaled up by 257)
      val n = width * height * storedChannels
      val out = new Array[Byte](n)
      var k = 0
      while (k < n) { out(k) = px(k * 2); k += 1 }
      Image(width, height, storedChannels, out)
    } else Image(width, height, storedChannels, px)
  }

  /** REAL bilinear resize on decoded pixels (replaces the r13 byte-prefix
    * stub): output pixel centers map back via the standard half-pixel
    * alignment sx = (ox+0.5)·w/tw − 0.5, clamped at the borders; each
    * channel interpolates the four straddling samples, rounds half-up,
    * clamps to [0,255]. Same-size resize is the exact identity (fx/fy
    * land on integers, the fractional weights vanish). One fixed-order
    * float path per sample → bit-reproducible, fixture-oracleable.
    */
  def resizeBilinear(img: Image, tw: Int, th: Int): Image = {
    require(tw > 0 && th > 0, s"Png.resizeBilinear: bad target ${tw}x$th")
    val Image(w, h, ch, src) = img
    val out = new Array[Byte](tw * th * ch)
    var oy = 0
    while (oy < th) {
      val sy = (oy + 0.5) * h / th - 0.5
      val y0 = math.max(0, math.min(h - 1, math.floor(sy).toInt))
      val y1 = math.min(h - 1, y0 + 1)
      val fy = math.max(0.0, sy - y0)
      var ox = 0
      while (ox < tw) {
        val sx = (ox + 0.5) * w / tw - 0.5
        val x0 = math.max(0, math.min(w - 1, math.floor(sx).toInt))
        val x1 = math.min(w - 1, x0 + 1)
        val fx = math.max(0.0, sx - x0)
        var c = 0
        while (c < ch) {
          val p00 = src((y0 * w + x0) * ch + c) & 0xff
          val p01 = src((y0 * w + x1) * ch + c) & 0xff
          val p10 = src((y1 * w + x0) * ch + c) & 0xff
          val p11 = src((y1 * w + x1) * ch + c) & 0xff
          val top = p00 + (p01 - p00) * fx
          val bot = p10 + (p11 - p10) * fx
          val v = math.floor(top + (bot - top) * fy + 0.5)
          out((oy * tw + ox) * ch + c) =
            math.max(0.0, math.min(255.0, v)).toInt.toByte
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    Image(tw, th, ch, out)
  }
}
