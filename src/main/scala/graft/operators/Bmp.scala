package graft.operators

/** Pure-JVM BMP (Windows DIB file) codec — the fourth image container in
  * the multimodal tier, and the simplest: no compression, no entropy
  * coding, just the BITMAPFILEHEADER + BITMAPINFOHEADER + pixel-array
  * layout from the public Windows GDI spec. BMPs are what screenshots,
  * scanned documents, and legacy datasets arrive as, so a crawl-scale
  * media scan must read them natively.
  *
  * Scope (canonical subset, fails loudly outside it):
  *   - 24-bit BI_RGB (bottom-up BGR rows padded to 4-byte multiples, or
  *     TOP-DOWN via negative biHeight — both appear in the wild),
  *   - 8-bit palettized (BGRA palette entries after the info header,
  *     clrUsed sizing with the 0-means-256 convention),
  *   - info headers of any biSize >= 40 (V4/V5 headers from modern
  *     screenshot tools carry extra color-space fields the pixel walk
  *     never needs — decode reads the first 40 bytes and skips the rest
  *     by biSize, like every RIFF walk in this tier skips unknown
  *     chunks).
  * RLE compression, 1/4/16/32-bit depths, and OS/2 headers reject by
  * name.
  *
  * Reference behavior being matched: the reference treats blobs as opaque
  * bytes (serializers/BytesSerializer.java); media decode is a pipeline
  * extension per the brief, wire format from the public BMP/DIB spec.
  */
object Bmp {

  private def le32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  private def le16(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()

  /** Bytes per stored scanline at `bpp` bits: rounded up to 4 bytes. */
  def strideOf(width: Int, bpp: Int): Int = ((width * bpp + 31) / 32) * 4

  /** 24-bit encoder. `pixels` are row-major TOP-DOWN RGB; storage flips
    * to bottom-up BGR padded rows unless `topDown` (negative biHeight —
    * the in-memory-DIB convention some writers emit to disk).
    */
  def encode(width: Int, height: Int, pixels: Array[Byte],
             topDown: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"Bmp.encode: bad dims ${width}x$height")
    require(pixels.length == width * height * 3,
      s"Bmp.encode: expected ${width * height * 3} bytes, got ${pixels.length}")
    val stride = strideOf(width, 24)
    val dataOff = 14 + 40
    val fileSize = dataOff + stride * height
    val out = new Array[Byte](fileSize)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putInt(0).putInt(dataOff)
    bb.putInt(40).putInt(width).putInt(if (topDown) -height else height)
      .putShort(1).putShort(24).putInt(0).putInt(stride * height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val rowOff = dataOff + y * stride
      var x = 0
      while (x < width) {
        out(rowOff + x * 3) = pixels((srcRow * width + x) * 3 + 2)     // B
        out(rowOff + x * 3 + 1) = pixels((srcRow * width + x) * 3 + 1) // G
        out(rowOff + x * 3 + 2) = pixels((srcRow * width + x) * 3)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** 8-bit palettized encoder. `indices` are row-major top-down;
    * `palette` is `size`×3 RGB triplets (stored as BGRA entries).
    */
  def encodePalette(width: Int, height: Int, indices: Array[Byte],
                    palette: Array[Byte], topDown: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0,
      s"Bmp.encodePalette: bad dims ${width}x$height")
    require(indices.length == width * height,
      s"Bmp.encodePalette: expected ${width * height} indices, got ${indices.length}")
    require(palette.length % 3 == 0 && palette.length >= 3 &&
      palette.length <= 256 * 3,
      s"Bmp.encodePalette: palette of ${palette.length} bytes is not 1..256 RGB triplets")
    val nPal = palette.length / 3
    indices.foreach(ix => require((ix & 0xff) < nPal,
      s"Bmp.encodePalette: index ${ix & 0xff} outside the $nPal-entry palette"))
    val stride = strideOf(width, 8)
    val dataOff = 14 + 40 + nPal * 4
    val fileSize = dataOff + stride * height
    val out = new Array[Byte](fileSize)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putInt(0).putInt(dataOff)
    bb.putInt(40).putInt(width).putInt(if (topDown) -height else height)
      .putShort(1).putShort(8).putInt(0).putInt(stride * height)
      .putInt(0).putInt(0).putInt(nPal).putInt(0)
    var k = 0
    while (k < nPal) {
      out(54 + k * 4) = palette(k * 3 + 2)     // B
      out(54 + k * 4 + 1) = palette(k * 3 + 1) // G
      out(54 + k * 4 + 2) = palette(k * 3)     // R
      k += 1
    }
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      System.arraycopy(indices, srcRow * width, out, dataOff + y * stride, width)
      y += 1
    }
    out
  }

  /** Decoder → top-down RGB. Handles 24-bit BI_RGB and 8-bit palettized,
    * both row orders, and >= 40-byte info headers (V4/V5 extra fields
    * skip by biSize). All bounds in long arithmetic — a crafted 32-bit
    * field cannot wrap a check.
    */
  def decode(payload: Array[Byte]): Png.Image = {
    require(payload != null && payload.length >= 54,
      "Bmp.decode: payload too short for BMP headers")
    require(payload(0) == 'B'.toByte && payload(1) == 'M'.toByte,
      "Bmp.decode: not a BMP payload (bad BM signature)")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOff = bb.getInt(10)
    val biSize = bb.getInt(14)
    require(biSize >= 40 && biSize <= payload.length, s"Bmp.decode: info header of $biSize bytes " +
      "not supported (BITMAPINFOHEADER or the V4/V5 extensions only)")
    val width = bb.getInt(18)
    val rawHeight = bb.getInt(22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val planes = bb.getShort(26) & 0xffff
    val bpp = bb.getShort(28) & 0xffff
    val compression = bb.getInt(30)
    val clrUsed = bb.getInt(46)
    require(width > 0 && height > 0 && rawHeight != Int.MinValue,
      s"Bmp.decode: degenerate dims ${width}x$rawHeight")
    require(planes == 1, s"Bmp.decode: $planes planes (must be 1)")
    require(compression == 0,
      s"Bmp.decode: compression $compression not supported (BI_RGB only; " +
        "RLE4/RLE8/bitfields reject)")
    require(bpp == 24 || bpp == 8,
      s"Bmp.decode: $bpp-bit not supported (24-bit BI_RGB and 8-bit " +
        "palettized only)")
    val stride = strideOf(width, bpp)
    require(dataOff.toLong >= 14L + biSize &&
      dataOff.toLong + stride.toLong * height <= payload.length,
      s"Bmp.decode: pixel array at $dataOff overruns the ${payload.length}-byte payload")
    val palette: Array[Byte] = if (bpp == 8) {
      val n = if (clrUsed == 0) 256 else clrUsed
      require(n > 0 && n <= 256, s"Bmp.decode: clrUsed $clrUsed out of range")
      require(14L + biSize + 4L * n <= dataOff,
        s"Bmp.decode: $n-entry palette overruns the pixel-array offset $dataOff")
      val p = new Array[Byte](n * 3)
      var k = 0
      while (k < n) {
        p(k * 3) = payload(14 + biSize + k * 4 + 2)     // R
        p(k * 3 + 1) = payload(14 + biSize + k * 4 + 1) // G
        p(k * 3 + 2) = payload(14 + biSize + k * 4)     // B
        k += 1
      }
      p
    } else null
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val rowOff = dataOff + srcRow * stride
      var x = 0
      while (x < width) {
        if (bpp == 24) {
          rgb((y * width + x) * 3) = payload(rowOff + x * 3 + 2)
          rgb((y * width + x) * 3 + 1) = payload(rowOff + x * 3 + 1)
          rgb((y * width + x) * 3 + 2) = payload(rowOff + x * 3)
        } else {
          val ix = payload(rowOff + x) & 0xff
          require(ix * 3 < palette.length,
            s"Bmp.decode: pixel index $ix outside the ${palette.length / 3}-entry palette")
          rgb((y * width + x) * 3) = palette(ix * 3)
          rgb((y * width + x) * 3 + 1) = palette(ix * 3 + 1)
          rgb((y * width + x) * 3 + 2) = palette(ix * 3 + 2)
        }
        x += 1
      }
      y += 1
    }
    Png.Image(width, height, 3, rgb)
  }
}
