package graft

import graft.operators.{Multimodal, Tiff}

/** TIFF tier spec: baseline encode→decode round trips across byte
  * orders, channel counts, compressions and strip splits; PackBits
  * arithmetic; loud rejections outside the baseline subset.
  */
class TiffSpec extends SparkSpec {
  import spark.implicits._

  private def px(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + i / 7 + seed * 13) % 256).toByte)

  test("encode→decode round-trips gray/RGB/RGBA across II/MM byte " +
    "orders, uncompressed/PackBits/LZW (± the horizontal-differencing " +
    "predictor) and strip splits; the sniffing dispatch routes both " +
    "magics") {
    for {
      ch <- Seq(1, 3, 4)
      le <- Seq(true, false)
      (comp, pred) <- Seq((1, 1), (32773, 1), (5, 1), (5, 2))
      rps <- Seq(3, 100)
    } {
      val w = 25; val h = 17
      val data = px(w * h * ch, ch * 7 + (if (le) 1 else 0))
      val payload = Tiff.encode(w, h, ch, data, le, comp, rps, pred)
      val img = Multimodal.decodeImage(payload) // sniffed, not direct
      assert(img.width === w && img.height === h && img.channels === ch,
        s"ch=$ch le=$le comp=$comp pred=$pred rps=$rps")
      assert(img.pixels.toSeq === data.toSeq,
        s"ch=$ch le=$le comp=$comp pred=$pred rps=$rps")
      val m = Tiff.meta(payload)
      assert(m.byte_order === (if (le) "II" else "MM"))
      assert(m.compression === (comp match {
        case 1 => "none"; case 5 => "lzw"; case _ => "packbits"
      }))
      assert(m.n_strips === (h + rps - 1) / rps)
    }
  }

  test("LZW: width bumps at the early-change boundaries (9→10→11→12), " +
    "the 4094 table reset, and the KwKwK case all round-trip; crafted " +
    "streams reject by name") {
    // high-entropy data registers one dict entry per ~1.x symbols:
    // 60k samples walks every width and crosses the 4094 reset
    val big = Array.tabulate(60000)(i =>
      ((i * 131 + (i >> 3) * 29 + (i >> 9) * 7) % 251).toByte)
    assert(Tiff.lzwDecode(Tiff.lzwEncode(big), big.length).toSeq
      === big.toSeq)
    // all-same input: the classic KwKwK chain from the second code on
    val kwk = Array.fill(4096)(42.toByte)
    assert(Tiff.lzwDecode(Tiff.lzwEncode(kwk), kwk.length).toSeq
      === kwk.toSeq)
    // truncation (EOI never reached) rejects by name
    val enc = Tiff.lzwEncode(px(5000, 3))
    val m1 = intercept[IllegalArgumentException](
      Tiff.lzwDecode(enc.take(enc.length / 2), 5000)).getMessage
    assert(m1.contains("LZW") && (m1.contains("truncated") ||
      m1.contains("decoded")), m1)
    // a code past the registered dictionary rejects by name
    val bad = Array[Byte](0x96.toByte, 0x00) // 9-bit code 300, nothing registered
    val m2 = intercept[IllegalArgumentException](
      Tiff.lzwDecode(bad, 100)).getMessage
    assert(m2.contains("outside the dictionary"), m2)
  }

  test("packBits: repeat runs, literals, 128-byte caps, and the exact-" +
    "size decode contract") {
    def roundTrip(data: Array[Byte]): Unit = {
      val packed = Tiff.packBits(data)
      // decode through a 1-strip gray image of the right size
      val img = Tiff.decode(Tiff.encode(data.length, 1, 1, data,
        le = true, compression = 32773, rowsPerStrip = 1))
      assert(img.pixels.toSeq === data.toSeq)
      val _ = packed
    }
    roundTrip(Array.fill(300)(7.toByte)) // long repeat, > 128 cap
    roundTrip(Array.tabulate(300)(_.toByte)) // long literal, > 128 cap
    roundTrip("aaabccccdefffffgg".getBytes)
    roundTrip(Array[Byte](1))
  }

  test("outside the baseline subset rejects by name; metadata still " +
    "reads what decode refuses") {
    def rej(body: => Any, frag: String): Unit =
      assert(intercept[IllegalArgumentException](body).getMessage.contains(frag), frag)
    rej(Tiff.decode("not a tiff at all...............".getBytes), "byte-order")
    val good = Tiff.encode(10, 8, 3, px(240, 1), le = true,
      compression = 1, rowsPerStrip = 4)
    rej(Tiff.decode(good.take(good.length - 10)), "overruns")
    // a CCITT file: poke the compression SHORT (tag 259) — metadata
    // names it, decode rejects by name
    val ccitt = good.clone()
    // find the 259 entry: IFD at 8, entries from 10, 12 bytes each
    val entryAt = (0 until 10).map(k => 10 + k * 12)
      .find(e => ((ccitt(e) & 0xff) | ((ccitt(e + 1) & 0xff) << 8)) == 259).get
    ccitt(entryAt + 8) = 4 // LE short low byte
    assert(Tiff.meta(ccitt).compression === "ccitt")
    rej(Tiff.decode(ccitt), "ccitt decode not supported")
    // the floating-point predictor (tag 317 = 3) rejects by name
    val fp = Tiff.encode(10, 8, 3, px(240, 1), le = true,
      compression = 5, rowsPerStrip = 4, predictor = 2)
    val pAt = (0 until 11).map(k => 10 + k * 12)
      .find(e => ((fp(e) & 0xff) | ((fp(e + 1) & 0xff) << 8)) == 317).get
    fp(pAt + 8) = 3
    rej(Tiff.decode(fp), "predictor 3")
    // magic mismatch rejects
    val badMagic = good.clone(); badMagic(2) = 41
    rej(Tiff.meta(badMagic), "42")
  }

  test("multi-page chains: every page round-trips through its own IFD, " +
    "pageCount walks the chain, decode reads page 0") {
    val w = 20; val h = 10
    val pages = (0 until 3).map(p => (w, h, 3, px(w * h * 3, p * 11 + 1)))
    val payload = Tiff.encodePages(pages, le = false, compression = 32773,
      rowsPerStrip = 4)
    assert(Tiff.pageCount(payload) === 3)
    assert(Tiff.decode(payload).pixels.toSeq === pages.head._4.toSeq)
    // single-page files report 1
    assert(Tiff.pageCount(Tiff.encode(5, 4, 1, px(20, 9), le = true,
      compression = 1, rowsPerStrip = 2)) === 1)
  }

  test("the Spark op agrees with the plant formulas on a doc sample") {
    val docs = Tables.documents(spark, sf).limit(30)
    val rows = Tiff.tiffDigest(spark, Tiff.tiffFromDocuments(spark, docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    docs.select("doc_id").as[Long].collect().foreach { id =>
      val (w, h, ch) = Tiff.plantDims(id)
      val r = rows(id)
      assert(r.getInt(4) === 1 + (id % 3).toInt, s"doc $id pages")
      assert(r.getInt(5) === w && r.getInt(6) === h && r.getInt(7) === ch)
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(Tiff.plantPixels(id, w, h, ch)).map("%02x".format(_)).mkString
      assert(r.getString(8) === want, s"doc $id")
    }
  }
}
