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
    "orders, uncompressed/PackBits and strip splits; the sniffing " +
    "dispatch routes both magics") {
    for {
      ch <- Seq(1, 3, 4)
      le <- Seq(true, false)
      pb <- Seq(false, true)
      rps <- Seq(3, 100)
    } {
      val w = 25; val h = 17
      val data = px(w * h * ch, ch * 7 + (if (le) 1 else 0))
      val payload = Tiff.encode(w, h, ch, data, le, pb, rps)
      val img = Multimodal.decodeImage(payload) // sniffed, not direct
      assert(img.width === w && img.height === h && img.channels === ch,
        s"ch=$ch le=$le pb=$pb rps=$rps")
      assert(img.pixels.toSeq === data.toSeq, s"ch=$ch le=$le pb=$pb rps=$rps")
      val m = Tiff.meta(payload)
      assert(m.byte_order === (if (le) "II" else "MM"))
      assert(m.compression === (if (pb) "packbits" else "none"))
      assert(m.n_strips === (h + rps - 1) / rps)
    }
  }

  test("packBits: repeat runs, literals, 128-byte caps, and the exact-" +
    "size decode contract") {
    def roundTrip(data: Array[Byte]): Unit = {
      val packed = Tiff.packBits(data)
      // decode through a 1-strip gray image of the right size
      val img = Tiff.decode(Tiff.encode(data.length, 1, 1, data,
        le = true, packbits = true, rowsPerStrip = 1))
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
      packbits = false, rowsPerStrip = 4)
    rej(Tiff.decode(good.take(good.length - 10)), "overruns")
    // an LZW file: poke the compression SHORT (tag 259) — metadata names
    // it, decode rejects by name
    val lzw = good.clone()
    // find the 259 entry: IFD at 8, entries from 10, 12 bytes each
    val entryAt = (0 until 10).map(k => 10 + k * 12)
      .find(e => ((lzw(e) & 0xff) | ((lzw(e + 1) & 0xff) << 8)) == 259).get
    lzw(entryAt + 8) = 5 // LE short low byte
    assert(Tiff.meta(lzw).compression === "lzw")
    rej(Tiff.decode(lzw), "lzw decode not supported")
    // magic mismatch rejects
    val badMagic = good.clone(); badMagic(2) = 41
    rej(Tiff.meta(badMagic), "42")
  }

  test("multi-page chains: every page round-trips through its own IFD, " +
    "pageCount walks the chain, decode reads page 0") {
    val w = 20; val h = 10
    val pages = (0 until 3).map(p => (w, h, 3, px(w * h * 3, p * 11 + 1)))
    val payload = Tiff.encodePages(pages, le = false, packbits = true,
      rowsPerStrip = 4)
    assert(Tiff.pageCount(payload) === 3)
    assert(Tiff.decode(payload).pixels.toSeq === pages.head._4.toSeq)
    // single-page files report 1
    assert(Tiff.pageCount(Tiff.encode(5, 4, 1, px(20, 9), le = true,
      packbits = false, rowsPerStrip = 2)) === 1)
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
