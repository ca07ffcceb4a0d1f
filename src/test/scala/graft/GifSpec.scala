package graft

import graft.operators.Gif
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM GIF codec spec. GIF is lossless on palette indices, so
  * every gate here is EXACT equality: encode→decode round trips, both
  * interop directions against the JDK's ImageIO GIF plugin, and
  * hand-computed animation composition (sub-rects, transparency,
  * disposal 0-3, interlace).
  */
class GifSpec extends AnyFunSuite {

  private def plantedIdx(n: Int, mod: Int, seed: Long): Array[Byte] =
    Array.tabulate(n) { i =>
      var z = seed * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
      z ^= (z >>> 31); z *= 0x94D049BB133111EBL
      (((z >>> 40) & 0xffL) % mod).toByte
    }

  private def plantedPalette(n: Int, seed: Long): Array[Byte] =
    Array.tabulate(n * 3) { i =>
      var z = seed * 0xD1B54A32D192ED03L + i.toLong * 0xBF58476D1CE4E5B9L
      z ^= (z >>> 31); z *= 0x94D049BB133111EBL
      ((z >>> 40) & 0xff).toByte
    }

  private def rgbOf(palette: Array[Byte], indices: Array[Byte]): Array[Byte] =
    indices.flatMap { b =>
      val i = (b & 0xff) * 3
      Array(palette(i), palette(i + 1), palette(i + 2))
    }

  test("encode→decode is the identity on single frames (palette sizes, " +
    "interlace, and the dictionary-overflow CLEAR path)") {
    for ((w, h, colors) <- Seq((7, 5, 4), (16, 11, 64), (33, 21, 256));
         interlace <- Seq(false, true)) {
      val pal = plantedPalette(colors, seed = colors)
      val idx = plantedIdx(w * h, colors, seed = w * 100 + h)
      val enc = Gif.encode(w, h, pal,
        Seq(Gif.FrameSpec(0, 0, w, h, idx, interlace = interlace)))
      val anim = Gif.decode(enc)
      assert(anim.width === w && anim.height === h && anim.frames.size === 1)
      assert(anim.frames.head.toSeq === rgbOf(pal, idx).toSeq,
        s"w=$w h=$h colors=$colors interlace=$interlace")
    }
    // dictionary overflow: a 256-color noise image big enough to pass
    // 4096 LZW entries forces the mid-stream CLEAR/reset path
    val pal = plantedPalette(256, seed = 9L)
    val big = plantedIdx(120 * 90, 256, seed = 11L)
    val anim = Gif.decode(Gif.encode(120, 90, pal,
      Seq(Gif.FrameSpec(0, 0, 120, 90, big))))
    assert(anim.frames.head.toSeq === rgbOf(pal, big).toSeq)
    // and a highly repetitive image exercises deep dictionary strings
    val rep = Array.tabulate(64 * 64)(i => ((i / 7) % 3).toByte)
    val anim2 = Gif.decode(Gif.encode(64, 64, plantedPalette(4, 2L),
      Seq(Gif.FrameSpec(0, 0, 64, 64, rep))))
    assert(anim2.frames.head.toSeq === rgbOf(plantedPalette(4, 2L), rep).toSeq)
  }

  test("round-trip sweep: every palette size × a dims grid — catches the " +
    "END-code width-bump boundary (entry count exactly 2^w at stream end)") {
    // regression: ps=4 w=4 h=3 / ps=16 w=28 h=11 / ps=64 w=28 h=7 once
    // desynced the final code width between encoder and decoder
    for (ps <- Seq(4, 16, 64, 256); w <- 4 to 33 by 3; h <- 3 to 25 by 2) {
      val pal = Array.tabulate(ps * 3)(k => (k * 37 + ps).toByte)
      val idx = Array.tabulate(w * h) { i =>
        var z = (w * 1000L + h) * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
        z ^= (z >>> 31); z *= 0x94D049BB133111EBL
        (((z >>> 40) & 0xffL) % ps).toByte
      }
      val anim = Gif.decode(Gif.encode(w, h, pal, Seq(Gif.FrameSpec(0, 0, w, h, idx))))
      assert(anim.frames.head.toSeq === rgbOf(pal, idx).toSeq, s"ps=$ps w=$w h=$h")
    }
  }

  test("animation composition: sub-rect draws, transparency, and all " +
    "disposal methods match hand-computed canvases") {
    // 4x3 screen, 4-color palette; bg index 3
    val pal = Array[Byte](
      10, 10, 10, /*0*/ 20, 20, 20, /*1*/ 30, 30, 30, /*2*/ 99, 99, 99 /*3*/)
    def solid(w: Int, h: Int, c: Int) = Array.fill(w * h)(c.toByte)
    val frames = Seq(
      // frame 0: full screen of color 0, keep
      Gif.FrameSpec(0, 0, 4, 3, solid(4, 3, 0), disposal = 1),
      // frame 1: 2x1 rect of color 1 at (1,1), then restore-background
      Gif.FrameSpec(1, 1, 2, 1, solid(2, 1, 1), disposal = 2),
      // frame 2: 2x2 rect at (2,1) with transparent index 2 checkers,
      // then restore-previous
      Gif.FrameSpec(2, 1, 2, 2, Array[Byte](1, 2, 2, 1),
        transparent = Some(2), disposal = 3),
      // frame 3: single pixel of color 2 at (0,0)
      Gif.FrameSpec(0, 0, 1, 1, solid(1, 1, 2), disposal = 0))
    val anim = Gif.decode(Gif.encode(4, 3, pal, frames, bgIndex = 3))
    assert(anim.frames.size === 4)
    def px(f: Int, x: Int, y: Int): Int = anim.frames(f)((y * 4 + x) * 3) & 0xff
    // frame 0: all color 0
    assert((0 until 4).forall(x => (0 until 3).forall(y => px(0, x, y) == 10)))
    // frame 1: color 1 at (1,1)-(2,1), rest still color 0
    assert(px(1, 1, 1) === 20 && px(1, 2, 1) === 20 && px(1, 0, 0) === 10)
    // frame 2: frame 1's rect (x=1..2, y=1) restored to BG (99) by
    // disposal 2, then the new rect draws (2,1)=1 over the restored cell;
    // the transparent cells show what's underneath — (3,1) and (2,2) were
    // never in frame 1's rect, so they still show frame 0's color 0
    assert(px(2, 1, 1) === 99, "disposal 2 must restore the rect to background")
    assert(px(2, 2, 1) === 20 && px(2, 3, 1) === 10)
    assert(px(2, 2, 2) === 10 && px(2, 3, 2) === 20)
    // frame 3: disposal 3 restored the pre-frame-2 canvas, then (0,0)=2
    assert(px(3, 0, 0) === 30)
    assert(px(3, 2, 1) === 99 && px(3, 2, 2) === 10,
      "disposal 3 must restore the canvas saved before frame 2")
    assert(anim.delaysCs === IndexedSeq(4, 4, 4, 4))
  }

  test("interop: ImageIO (the JDK GIF plugin) reads our streams and we " +
    "read its — exact both ways, GIF is lossless") {
    val (w, h) = (23, 17)
    val pal = plantedPalette(16, seed = 5L)
    val idx = plantedIdx(w * h, 16, seed = 6L)
    // ours → ImageIO
    val enc = Gif.encode(w, h, pal, Seq(Gif.FrameSpec(0, 0, w, h, idx)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(img != null && img.getWidth === w && img.getHeight === h)
    val want = rgbOf(pal, idx)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val o = (y * w + x) * 3
      assert(((rgb >> 16) & 0xff) === (want(o) & 0xff), s"R at ($x,$y)")
      assert(((rgb >> 8) & 0xff) === (want(o + 1) & 0xff), s"G at ($x,$y)")
      assert((rgb & 0xff) === (want(o + 2) & 0xff), s"B at ($x,$y)")
    }
    // ImageIO → ours: index-model image so the pixel path is exact
    val cm = new java.awt.image.IndexColorModel(4, 16,
      Array.tabulate(16)(i => pal(i * 3)),
      Array.tabulate(16)(i => pal(i * 3 + 1)),
      Array.tabulate(16)(i => pal(i * 3 + 2)))
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, idx(y * w + x) & 0xff)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "gif", baos))
    val mine = Gif.decode(baos.toByteArray)
    assert(mine.width === w && mine.height === h && mine.frames.size === 1)
    assert(mine.frames.head.toSeq === want.toSeq,
      "our decoder must reproduce the foreign encoder's pixels exactly")
  }

  test("corruption and unsupported features reject by name") {
    val pal = plantedPalette(4, 1L)
    val good = Gif.encode(5, 4, pal,
      Seq(Gif.FrameSpec(0, 0, 5, 4, plantedIdx(20, 4, 3L))))
    // not a GIF
    val hdr = intercept[IllegalArgumentException](
      Gif.decode("JIF89a-not-a-gif-stream".getBytes))
    assert(hdr.getMessage.contains("header"))
    // truncated mid-image
    intercept[IllegalArgumentException](Gif.decode(good.take(good.length - 6)))
    // unknown block type where an image/extension/trailer belongs
    val bad = good.clone()
    // first block after the 13-byte header + 4*3... find the 0x21 or 0x2c
    val at = bad.indices.indexWhere(i => i >= 13 &&
      ((bad(i) & 0xff) == 0x2c || (bad(i) & 0xff) == 0x21))
    bad(at) = 0x5a.toByte
    val blk = intercept[IllegalArgumentException](Gif.decode(bad))
    assert(blk.getMessage.contains("unknown block"))
    // frame rect outside the screen
    intercept[IllegalArgumentException](
      Gif.encode(4, 4, pal, Seq(Gif.FrameSpec(2, 2, 4, 4, plantedIdx(16, 4, 3L)))))
    // index outside the palette bit width
    intercept[IllegalArgumentException](
      Gif.encode(2, 2, pal, Seq(Gif.FrameSpec(0, 0, 2, 2, Array[Byte](0, 1, 2, 9)))))
    // encoder rejects empty animations and bad disposal
    intercept[IllegalArgumentException](Gif.encode(2, 2, pal, Seq.empty))
    intercept[IllegalArgumentException](
      Gif.encode(2, 2, pal, Seq(Gif.FrameSpec(0, 0, 2, 2,
        plantedIdx(4, 4, 3L), disposal = 5))))
  }
}
