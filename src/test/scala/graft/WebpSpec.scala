package graft

import graft.operators.{Png, Webp}

/** WebP tier spec: VP8L encode→decode round trips across every encoder
  * mode (literals, color cache, LZ77 runs against distance 1 and the
  * row stride, subtract-green, palette with every bundling width),
  * container metadata across VP8/VP8L/VP8X/animation, and loud
  * rejection of crafted/unsupported payloads.
  */
class WebpSpec extends SparkSpec {
  import spark.implicits._

  private def plantArgb(w: Int, h: Int, seed: Int, alpha: Boolean): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = (x * 7 + y * 3 + seed) % 256
      val g = (x * 3 + y * 11 + seed * 5) % 256
      val b = (x * 13 + y * 5 + seed * 7) % 256
      val a = if (alpha && (x + y + seed) % 3 == 0) 200 + (x % 55) else 255
      (a << 24) | (r << 16) | (g << 8) | b
    }

  private def rgbaOf(img: Png.Image): Array[Int] = {
    val ch = img.channels
    Array.tabulate(img.width * img.height) { i =>
      val r = img.pixels(i * ch) & 0xff
      val g = img.pixels(i * ch + 1) & 0xff
      val b = img.pixels(i * ch + 2) & 0xff
      val a = if (ch == 4) img.pixels(i * ch + 3) & 0xff else 255
      (a << 24) | (r << 16) | (g << 8) | b
    }
  }

  test("VP8L encode→decode is the identity: literals, color cache, LZ77 " +
    "(distance 1 + row stride — the 2D map head), subtract-green, and " +
    "their combinations; alpha drives the channel count") {
    val cases = Seq(
      (Webp.EncodeOpts(), false),
      (Webp.EncodeOpts(cacheBits = 6), false),
      (Webp.EncodeOpts(lz77 = true), false),
      (Webp.EncodeOpts(subtractGreen = true), false),
      (Webp.EncodeOpts(cacheBits = 4, lz77 = true, subtractGreen = true), false),
      (Webp.EncodeOpts(cacheBits = 8, lz77 = true), true))
    cases.zipWithIndex.foreach { case ((opts, alpha), k) =>
      val w = 23 + k; val h = 17 + k
      val argb = plantArgb(w, h, 11 + k, alpha)
      val img = Webp.decodeImage(Webp.encodeLossless(w, h, argb, opts))
      assert(img.width === w && img.height === h, s"case $k")
      assert(img.channels === (if (alpha) 4 else 3), s"case $k")
      assert(rgbaOf(img).toSeq === argb.toSeq, s"case $k ($opts)")
    }
    // flat rows + flat columns force LZ77 runs on BOTH planted distances
    val runs = Array.tabulate(16 * 12) { i =>
      val y = i / 16
      0xff000000 | (if (y < 6) 0x102030 else (i % 16) << 8)
    }
    val img = Webp.decodeImage(Webp.encodeLossless(16, 12, runs,
      Webp.EncodeOpts(lz77 = true)))
    assert(rgbaOf(img).toSeq === runs.toSeq)
  }

  test("palette mode round-trips at every bundling width (2, 4, 16, 256 " +
    "colors) including non-multiple row widths") {
    for ((nColors, k) <- Seq(2, 3, 4, 9, 16, 40, 256).zipWithIndex) {
      val w = 21 + k; val h = 9 + k
      val palette = Array.tabulate(nColors)(c =>
        0xff000000 | (((c * 37 + 11) % 256) << 16) | (((c * 91 + 3) % 256) << 8) |
          ((c * 53 + 7) % 256))
      val argb = Array.tabulate(w * h)(i => palette((i * 7 + i / w) % nColors))
      val img = Webp.decodeImage(Webp.encodeLossless(w, h, argb,
        Webp.EncodeOpts(palette = true)))
      assert(rgbaOf(img).toSeq === argb.toSeq, s"$nColors colors")
    }
  }

  test("container metadata: VP8 dims from the keyframe header, VP8L dims " +
    "and alpha hint, VP8X flags/canvas/animation frame count") {
    val lossy = Webp.meta(Webp.encodeLossyMeta(640, 360, 100))
    assert(lossy === Webp.Meta("vp8", 640, 360, false, false, 1, false, false))
    val argb = plantArgb(30, 20, 3, alpha = true)
    val lossless = Webp.meta(Webp.encodeLossless(30, 20, argb))
    assert(lossless.format === "vp8l" && lossless.width === 30 &&
      lossless.height === 20 && lossless.has_alpha)
    val ext = Webp.meta(Webp.encodeVp8x(30, 20, argb,
      exif = Some(Array[Byte](1, 2, 3))))
    assert(ext.format === "vp8x+vp8l" && ext.has_alpha && ext.has_exif &&
      !ext.is_animated && ext.n_frames === 1)
    val anim = Webp.meta(Webp.encodeVp8x(30, 20, argb, animFrames = 3))
    assert(anim.format === "vp8x+anim" && anim.is_animated && anim.n_frames === 3)
    // VP8X-wrapped static images decode like bare VP8L
    val viaX = Webp.decodeImage(Webp.encodeVp8x(30, 20, argb))
    assert(rgbaOf(viaX).toSeq === argb.toSeq)
  }

  test("crafted and unsupported payloads reject by name") {
    def rej(p: Array[Byte], frag: String): Unit = {
      val m = intercept[IllegalArgumentException] {
        Webp.meta(p); Webp.decodeImage(p)
      }.getMessage
      assert(m.contains(frag), m)
    }
    rej("definitely not a webp file, not even RIFF..".getBytes, "RIFF/WEBP")
    val argb = plantArgb(20, 14, 5, alpha = false)
    val good = Webp.encodeLossless(20, 14, argb)
    rej(good.take(good.length - 6), "overruns")
    // lossy decode rejects by codec name, meta still reads it
    val lossy = Webp.encodeLossyMeta(64, 48, 40)
    assert(Webp.meta(lossy).format === "vp8")
    val m = intercept[IllegalArgumentException](Webp.decodeImage(lossy)).getMessage
    assert(m.contains("lossy VP8"), m)
    // animation decode rejects by name
    val anim = Webp.encodeVp8x(20, 14, argb, animFrames = 2)
    val m2 = intercept[IllegalArgumentException](Webp.decodeImage(anim)).getMessage
    assert(m2.contains("animated"), m2)
    // a 14-bit header declaring a 16384x16384 canvas rejects BEFORE
    // allocating (the VP8L chunk is 6 header bytes + garbage)
    val huge = {
      val bw = new Webp.BitWriter
      bw.writeBits(0x2f, 8)
      bw.writeBits(16383, 14); bw.writeBits(16383, 14)
      bw.writeBits(0, 1); bw.writeBits(0, 3)
      bw.writeBits(0, 32)
      bw.toBytes
    }
    val riffHuge = {
      val o = new java.io.ByteArrayOutputStream()
      o.write("RIFF".getBytes); o.write(Array[Byte](
        ((huge.length + 12) & 0xff).toByte, 0, 0, 0))
      o.write("WEBP".getBytes)
      o.write("VP8L".getBytes)
      o.write(Array[Byte]((huge.length & 0xff).toByte, 0, 0, 0))
      o.write(huge)
      o.toByteArray
    }
    val m3 = intercept[IllegalArgumentException](
      Webp.decodeImage(riffHuge)).getMessage
    assert(m3.contains("cap"), m3)
    // a backref reaching before the image rejects (crafted via a
    // truncated-to-corrupt stream is covered above; distance checks are
    // unit-level in the decoder)
  }

  test("animated WebP: per-frame VP8L round trip through the " +
    "container-blind decodeVideo dispatch; partial frames reject by name") {
    val w = 18; val h = 12
    val frames = (0 until 3).map(f => plantArgb(w, h, 7 + f, alpha = false))
    val anim = Webp.encodeAnim(w, h, frames, Seq(40, 50, 60),
      Webp.EncodeOpts(lz77 = true))
    val v = graft.operators.Multimodal.decodeVideo(anim)
    assert(v.width === w && v.height === h && v.frames.length === 3)
    assert(v.microSecPerFrame === 40000) // first ANMF duration, ms → µs
    v.frames.zip(frames).foreach { case (rgb, argb) =>
      val want = argb.flatMap(p => Seq(((p >> 16) & 0xff).toByte,
        ((p >> 8) & 0xff).toByte, (p & 0xff).toByte))
      assert(rgb.toSeq === want.toSeq)
    }
    // decodeAnim agrees with the dispatch (same function underneath)
    assert(Webp.decodeAnim(anim).frames.length === 3)
    // a partial (non-canvas) frame rejects by name: shrink frame 0's
    // declared dims in the first ANMF header (width-1 at body offset 6)
    val poked = anim.clone()
    val anmfAt = {
      var i = 12
      while (!(poked(i) == 'A' && poked(i + 1) == 'N' && poked(i + 2) == 'M' &&
        poked(i + 3) == 'F')) i += 1
      i
    }
    poked(anmfAt + 8 + 6) = (w - 2).toByte
    val m = intercept[IllegalArgumentException](
      Webp.decodeAnim(poked)).getMessage
    assert(m.contains("full-canvas"), m)
  }

  test("the Spark ops agree with the plant formulas on a doc sample: " +
    "routes/dims in webpMeta, byte-exact pixels through webpPixelDigest") {
    val docs = Tables.documents(spark, sf).limit(44)
    val metas = Webp.webpMeta(spark, Webp.webpFromDocuments(spark, docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    var sawRoutes = Set.empty[String]
    docs.select("doc_id").as[Long].collect().foreach { id =>
      val r = metas(id)
      val (w, h) = Webp.plantDims(id)
      assert(r.getInt(2) === w && r.getInt(3) === h, s"doc $id")
      val fmt = Webp.plantRoute(id) match {
        case "lossy" => "vp8"
        case "anim" => "vp8x+anim"
        case "vp8x" => "vp8x+vp8l"
        case _ => "vp8l"
      }
      assert(r.getString(1) === fmt, s"doc $id")
      sawRoutes += fmt
    }
    assert(sawRoutes.size === 4, s"routes seen: $sawRoutes")
    val decodable = docs.filter("doc_id % 11 not in (5, 7)")
    Webp.webpPixelDigest(spark, Webp.webpFromDocuments(spark, decodable))
      .collect().foreach { r =>
        val id = r.getLong(0)
        val argb = Webp.plantArgb(id)
        val ch = r.getInt(3)
        val px = new Array[Byte](argb.length * ch)
        argb.zipWithIndex.foreach { case (p, i) =>
          px(i * ch) = ((p >> 16) & 0xff).toByte
          px(i * ch + 1) = ((p >> 8) & 0xff).toByte
          px(i * ch + 2) = (p & 0xff).toByte
          if (ch == 4) px(i * ch + 3) = ((p >>> 24) & 0xff).toByte
        }
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(px).map("%02x".format(_)).mkString
        assert(r.getString(4) === md5, s"doc $id")
      }
  }

  test("the flat-code machinery is self-consistent: every alphabet slot " +
    "used at one depth still writes a decodable code-length code") {
    // 256 distinct red values forces the all-slots-one-length CL case
    val argb = Array.tabulate(16 * 16)(i => 0xff000000 | (i << 16) | (7 << 8) | 3)
    val img = Webp.decodeImage(Webp.encodeLossless(16, 16, argb))
    val back = Array.tabulate(16 * 16) { i =>
      val ch = img.channels
      0xff000000 | ((img.pixels(i * ch) & 0xff) << 16) |
        ((img.pixels(i * ch + 1) & 0xff) << 8) | (img.pixels(i * ch + 2) & 0xff)
    }
    assert(back.toSeq === argb.toSeq)
  }
}
