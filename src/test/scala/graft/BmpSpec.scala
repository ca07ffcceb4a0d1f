package graft

import graft.operators.Bmp
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM BMP codec spec. BMP is lossless, so every gate is EXACT
  * equality: encode→decode round trips over both depths and row orders,
  * both interop directions against the JDK's ImageIO BMP plugin, V4/V5
  * header tolerance, and loud rejection outside the canonical subset.
  */
class BmpSpec extends AnyFunSuite {

  private def planted(n: Int, seed: Long): Array[Byte] =
    Array.tabulate(n) { i =>
      var z = seed * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
      z ^= (z >>> 31); z *= 0x94D049BB133111EBL
      ((z >>> 40) & 0xff).toByte
    }

  test("24-bit encode→decode is the identity across row orders and the " +
    "4-byte row padding (odd widths)") {
    for (w <- Seq(1, 3, 4, 5, 7, 8); h <- Seq(1, 2, 5); td <- Seq(false, true)) {
      val px = planted(w * h * 3, w * 1000 + h * 10 + (if (td) 1 else 0))
      val img = Bmp.decode(Bmp.encode(w, h, px, topDown = td))
      assert(img.width === w && img.height === h && img.channels === 3)
      assert(img.pixels.toSeq === px.toSeq, s"${w}x$h topDown=$td")
    }
    assert(Bmp.strideOf(3, 24) === 12 && Bmp.strideOf(4, 24) === 12 &&
      Bmp.strideOf(5, 24) === 16 && Bmp.strideOf(5, 8) === 8)
  }

  test("8-bit palettized encode→decode resolves indices through the BGRA " +
    "palette exactly, both row orders, all palette sizes; clrUsed 0 " +
    "means 256") {
    for (ps <- Seq(2, 4, 16, 256); td <- Seq(false, true)) {
      val w = 7; val h = 5
      val pal = planted(ps * 3, ps)
      val idx = planted(w * h, ps * 31L).map(b => ((b & 0xff) % ps).toByte)
      val img = Bmp.decode(Bmp.encodePalette(w, h, idx, pal, topDown = td))
      val want = idx.flatMap { b =>
        val k = (b & 0xff) * 3; Array(pal(k), pal(k + 1), pal(k + 2))
      }
      assert(img.pixels.toSeq === want.toSeq, s"ps=$ps topDown=$td")
    }
    // clrUsed = 0 → 256 entries: patch the field on a 256-palette stream
    val pal = planted(256 * 3, 9L)
    val idx = planted(12, 10L)
    val enc = Bmp.encodePalette(4, 3, idx, pal)
    java.nio.ByteBuffer.wrap(enc).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(46, 0)
    val img = Bmp.decode(enc)
    val want = idx.flatMap { b =>
      val k = (b & 0xff) * 3; Array(pal(k), pal(k + 1), pal(k + 2))
    }
    assert(img.pixels.toSeq === want.toSeq)
  }

  test("V4/V5-sized info headers (biSize 108/124) decode — the extra " +
    "color-space fields skip by size") {
    val w = 5; val h = 4
    val px = planted(w * h * 3, 77L)
    val base = Bmp.encode(w, h, px)
    for (biSize <- Seq(108, 124)) {
      val extra = biSize - 40
      val grown = new Array[Byte](base.length + extra)
      System.arraycopy(base, 0, grown, 0, 54)
      System.arraycopy(base, 54, grown, 54 + extra, base.length - 54)
      val bb = java.nio.ByteBuffer.wrap(grown)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(2, grown.length)  // fileSize
      bb.putInt(10, 14 + biSize)  // dataOffset
      bb.putInt(14, biSize)       // biSize
      val img = Bmp.decode(grown)
      assert(img.pixels.toSeq === px.toSeq, s"biSize=$biSize")
    }
  }

  test("rejects junk, truncation, RLE, 16-bit, and out-of-palette " +
    "indices by name") {
    intercept[IllegalArgumentException](
      Bmp.decode("definitely not a bitmap payload .............".getBytes))
    val good = Bmp.encode(5, 4, planted(60, 1L))
    intercept[IllegalArgumentException](Bmp.decode(good.take(40)))
    intercept[IllegalArgumentException](Bmp.decode(good.take(good.length - 8)))
    val rle = good.clone()
    java.nio.ByteBuffer.wrap(rle).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(30, 1) // BI_RLE8
    assert(intercept[IllegalArgumentException](Bmp.decode(rle))
      .getMessage.contains("compression"))
    val sixteen = good.clone()
    java.nio.ByteBuffer.wrap(sixteen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(28, 16)
    assert(intercept[IllegalArgumentException](Bmp.decode(sixteen))
      .getMessage.contains("16-bit"))
    // encodePalette guards indices against the palette size
    assert(intercept[IllegalArgumentException](
      Bmp.encodePalette(2, 1, Array[Byte](0, 5), planted(4 * 3, 2L)))
      .getMessage.contains("outside"))
    // an 8-bit stream whose clrUsed undercounts the indices rejects at
    // the lookup, not out-of-bounds
    val pal16 = planted(16 * 3, 3L)
    val idx = Array.tabulate[Byte](6)(i => (i + 10).toByte) // uses 10..15
    val pstream = Bmp.encodePalette(3, 2, idx, pal16)
    java.nio.ByteBuffer.wrap(pstream).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(46, 8) // claim only 8 entries
    assert(intercept[IllegalArgumentException](Bmp.decode(pstream))
      .getMessage.contains("palette"))
    // a crafted biSize near Int.MaxValue must not wrap `14 + biSize`
    // negative and sneak the pixel array over the header — reject loudly
    val crafted = good.clone()
    java.nio.ByteBuffer.wrap(crafted).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(14, Int.MaxValue - 4)
    assert(intercept[IllegalArgumentException](Bmp.decode(crafted))
      .getMessage.contains("info header"))
  }

  test("interop: ImageIO (the JDK BMP plugin) reads our streams and we " +
    "read its — EXACT both directions") {
    val w = 9; val h = 6
    val px = planted(w * h * 3, 42L)
    // ours → ImageIO (bottom-up and top-down)
    for (td <- Seq(false, true)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Bmp.encode(w, h, px, topDown = td)))
      assert(img.getWidth === w && img.getHeight === h, s"topDown=$td")
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val p = (y * w + x) * 3
        assert(((argb >> 16) & 0xff) === (px(p) & 0xff), s"R $x,$y td=$td")
        assert(((argb >> 8) & 0xff) === (px(p + 1) & 0xff), s"G $x,$y td=$td")
        assert((argb & 0xff) === (px(p + 2) & 0xff), s"B $x,$y td=$td")
      }
    }
    // ImageIO → ours
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      bi.setRGB(x, y, ((px(p) & 0xff) << 16) | ((px(p + 1) & 0xff) << 8) |
        (px(p + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "bmp", bos))
    val ours = Bmp.decode(bos.toByteArray)
    assert(ours.width === w && ours.height === h)
    assert(ours.pixels.toSeq === px.toSeq)
  }

  test("decodeImage sniffs 'BM' so BMPs flow through the shared feature " +
    "pass; planted corpus parity with the direct decode") {
    val px = planted(4 * 3 * 3, 5L)
    val viaSniff = graft.operators.Multimodal.decodeImage(Bmp.encode(4, 3, px))
    assert(viaSniff.pixels.toSeq === px.toSeq)
  }
}
