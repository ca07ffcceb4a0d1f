package graft

import graft.sources.{Archives, Docx, Epub}
import graft.sources.Archives.{Tar, Zip}

/** Wild-sample corpus: REAL files written by FOREIGN tools (Info-ZIP's
  * `zip`, GNU tar in ustar mode, the gzip CLI, Python's zipfile — none
  * of them this repo's encoders), committed under
  * `src/test/resources/wild/`. Every planted oracle runs on payloads
  * the repo's own writers synthesized, which is exactly how wild-data
  * gaps (the MP3 ID3v1/Xing class) stay invisible — this spec is the
  * cheap insurance: the walkers must parse these files (or reject with
  * their documented names), not just their own output.
  */
class WildSamplesSpec extends SparkSpec {

  private def wild(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/wild/$name")
    require(in != null, s"missing wild fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val memberText = Map(
    "src/a.txt" -> "alpha beta gamma delta\n",
    "src/deep/b.txt" -> "epsilon zeta\n",
    "README.md" -> "readme words here for the wild corpus\n")

  test("Info-ZIP's zip: catalog walks, every file member extracts " +
    "CRC-verified to the known text") {
    val p = wild("infozip.zip")
    val files = Zip.entries(p).filter(!_._1.is_dir)
    assert(files.map(_._1.name).toSet === memberText.keySet)
    files.foreach { case (e, off) =>
      assert(new String(Zip.extract(p, e, off), "UTF-8") === memberText(e.name), e.name)
    }
  }

  test("Python zipfile's zip: a third independent writer walks and " +
    "extracts identically") {
    val p = wild("pyzip.zip")
    val files = Zip.entries(p).filter(!_._1.is_dir)
    assert(files.map(_._1.name).toSet === memberText.keySet)
    files.foreach { case (e, off) =>
      assert(new String(Zip.extract(p, e, off), "UTF-8") === memberText(e.name), e.name)
    }
  }

  test("GNU tar (ustar mode): headers checksum-verify, file members " +
    "extract; the gzip-CLI tgz unwraps to the same archive") {
    val p = wild("gnutar.tar")
    val files = Tar.entries(p).filter(!_._1.is_dir)
    assert(files.map(_._1.name).toSet === memberText.keySet)
    files.foreach { case (e, off) =>
      assert(new String(Tar.extract(p, e, off), "UTF-8") === memberText(e.name), e.name)
    }
    val unwrapped = Archives.gunzip(wild("gnutar.tar.gz"))
    assert(unwrapped.toSeq === p.toSeq)
  }

  // ── JDK-writer media: ImageIO's TIFF/PNG/GIF/BMP/JPEG encoders and
  //    javax.sound's WAV writer are foreign implementations (libjpeg-
  //    lineage JPEG, libtiff-convention LZW) none of the repo's codecs
  //    share — the first real-encoder cross-check for the image tiers.
  //    Pixel formulas mirror tools/GenWild (deleted after generating).

  private def rgbAt(x: Int, y: Int): (Int, Int, Int) =
    ((x * 3 + y * 5) % 256, (x * 11 + y * 2) % 256, (x * 5 + y * 7) % 256)

  private def checkRgb(img: graft.operators.Png.Image, tag: String): Unit = {
    assert(img.width === 40 && img.height === 30 && img.channels === 3, tag)
    for (y <- 0 until 30; x <- 0 until 40) {
      val (r, g, b) = rgbAt(x, y)
      val o = (y * 40 + x) * 3
      assert((img.pixels(o) & 0xff) === r, s"$tag ($x,$y) r")
      assert((img.pixels(o + 1) & 0xff) === g, s"$tag ($x,$y) g")
      assert((img.pixels(o + 2) & 0xff) === b, s"$tag ($x,$y) b")
    }
  }

  test("ImageIO-written TIFFs decode byte-exactly: gray + RGB LZW " +
    "(the libtiff early-change convention from a foreign writer) and " +
    "RGB PackBits") {
    val gray = wild("imageio_gray_lzw.tif")
    assert(graft.operators.Tiff.meta(gray).compression === "lzw")
    val gi = graft.operators.Tiff.decode(gray)
    assert(gi.width === 40 && gi.height === 30 && gi.channels === 1)
    for (y <- 0 until 30; x <- 0 until 40)
      assert((gi.pixels(y * 40 + x) & 0xff) === (x * 7 + y * 13) % 256,
        s"gray ($x,$y)")
    val lzw = wild("imageio_rgb_lzw.tif")
    assert(graft.operators.Tiff.meta(lzw).compression === "lzw")
    checkRgb(graft.operators.Tiff.decode(lzw), "rgb-lzw")
    val pb = wild("imageio_rgb_packbits.tif")
    assert(graft.operators.Tiff.meta(pb).compression === "packbits")
    checkRgb(graft.operators.Tiff.decode(pb), "rgb-packbits")
  }

  test("ImageIO-written PNG and BMP decode byte-exactly through the " +
    "sniffing dispatch") {
    checkRgb(graft.operators.Multimodal.decodeImage(wild("imageio.png")), "png")
    checkRgb(graft.operators.Multimodal.decodeImage(wild("imageio.bmp")), "bmp")
  }

  test("an ImageIO-written GIF (explicit 256-gray palette) decodes " +
    "byte-exactly") {
    val img = graft.operators.Multimodal.decodeImage(wild("imageio.gif"))
    assert(img.width === 40 && img.height === 30 && img.channels === 3)
    for (y <- 0 until 30; x <- 0 until 40) {
      val v = (x * 7 + y * 13) % 256
      val o = (y * 40 + x) * 3
      assert((img.pixels(o) & 0xff) === v &&
        (img.pixels(o + 1) & 0xff) === v &&
        (img.pixels(o + 2) & 0xff) === v, s"gif ($x,$y)")
    }
  }

  test("an ImageIO-written baseline JPEG (default 4:2:0, libjpeg-style " +
    "tables) decodes within lossy tolerance of the planted gradient") {
    val img = graft.operators.Multimodal.decodeImage(wild("imageio.jpg"))
    assert(img.width === 64 && img.height === 48 && img.channels === 3)
    var err = 0L
    for (y <- 0 until 48; x <- 0 until 64) {
      val r = (x * 255) / 63; val g = (y * 255) / 47
      val b = ((x + y) * 255) / (64 + 48 - 2)
      val o = (y * 64 + x) * 3
      err += math.abs((img.pixels(o) & 0xff) - r) +
        math.abs((img.pixels(o + 1) & 0xff) - g) +
        math.abs((img.pixels(o + 2) & 0xff) - b)
    }
    val mean = err.toDouble / (64 * 48 * 3)
    assert(mean < 8.0, s"mean abs error $mean vs the planted gradient")
  }

  test("a javax.sound-written WAV decodes to the exact planted sine") {
    val (rate, samples) = graft.operators.Multimodal.wavDecode(wild("javasound.wav"))
    assert(rate === 8000 && samples.length === 2000)
    (0 until 2000).foreach { i =>
      val want = (math.sin(i * 2 * math.Pi * 440 / 8000) * 12000).toInt
      assert(samples(i) === want.toShort, s"sample $i")
    }
  }

  test("a Python-written DOCX extracts its paragraphs") {
    assert(Docx.extract(wild("wild.docx")) ===
      "Hello wild docx\nsecond paragraph & entity")
  }

  test("a Python-written EPUB walks its spine and extracts chapter text " +
    "through the shared htmlToText column") {
    val chapters = Epub.chapters(wild("wild.epub"))
    assert(chapters.map(_.href) === Seq("ch0.xhtml", "ch1.xhtml"))
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq(chapters(0).xhtml, chapters(1).xhtml).toDF("xhtml")
      .select(graft.operators.TextAnalysis.htmlToText(col("xhtml")).as("t"))
      .as[String].collect()
    // htmlToText is the LEXICAL layer: head/title text stays (block
    // classification is a later stage), so the title leads each chapter
    assert(texts(0) === "c0 Chapter 0 wild epub text one")
    assert(texts(1) === "c1 Chapter 1 wild epub text two")
  }
}
