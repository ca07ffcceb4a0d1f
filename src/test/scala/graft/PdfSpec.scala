package graft

import graft.operators.Pdf

/** PDF tier spec: hand-checked encode→extract round trips across every
  * planted wire form (raw vs FlateDecode streams, direct vs indirect
  * /Length, flat vs nested page trees, literal/octal/hex strings, all
  * four show operators), string-escape decoding, loud rejection of
  * crafted/unsupported files, and the Spark-facing ops.
  */
class PdfSpec extends SparkSpec {
  import spark.implicits._

  private val pages = Seq(
    Seq("alpha beta gamma delta", "epsilon zeta", "eta theta iota kappa"),
    Seq("lambda mu", "nu xi omicron pi"))

  test("encode→extract round-trips page text across compression, length " +
    "indirection, page-tree nesting and string forms") {
    for (compress <- Seq(false, true); indirect <- Seq(false, true);
         nested <- Seq(false, true); esc <- Seq(false, true);
         hex <- Seq(false, true)) {
      val payload = Pdf.encode(pages, "spec", compress, indirect, nested,
        escapeFirst = esc, hexLines = hex)
      val doc = Pdf.open(payload)
      val got = Pdf.pageObjects(doc).map(p => Pdf.pageText(doc, p))
      assert(got === pages.map(_.mkString("\n")),
        s"compress=$compress indirect=$indirect nested=$nested esc=$esc hex=$hex")
    }
  }

  /** Re-derive the classic xref/trailer/startxref for a string-poked
    * body whose object offsets may have shifted (object numbers must
    * stay 1..n with /Root 1 and /Info last).
    */
  private def rebuildXref(full: String): Array[Byte] = {
    val body = full.substring(0, full.indexOf("xref\n"))
    val nums = "(\\d+) 0 obj".r.findAllMatchIn(body)
      .map(m => (m.group(1).toLong, m.start.toLong)).toSeq.sortBy(_._1)
    val sb = new StringBuilder(body)
    sb.append(s"xref\n0 ${nums.length + 1}\n0000000000 65535 f \n")
    nums.foreach { case (_, off) => sb.append(f"$off%010d 00000 n \n") }
    sb.append(s"trailer\n<< /Size ${nums.length + 1} /Root 1 0 R " +
      s"/Info ${nums.last._1} 0 R >>\nstartxref\n${body.length}\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  test("simple-font encodings: /Differences and /ToUnicode re-encoded " +
    "text extracts back to the original; composite fonts, foreign " +
    "glyph names and multi-byte CMap codes reject by name") {
    val want = pages.map(_.mkString("\n"))
    for (variant <- Seq(1, 2); compress <- Seq(false, true)) {
      val payload = Pdf.encode(pages, "spec", compress,
        indirectLength = false, nestedKids = false, fontVariant = variant)
      // the wire bytes must NOT carry the plain text (else the variant
      // planted nothing) …
      val wire = new String(payload, "ISO-8859-1")
      assert(!wire.contains("alpha"), s"variant=$variant not re-encoded")
      // … but extraction maps codes back through the declared encoding
      val doc = Pdf.open(payload)
      val got = Pdf.pageObjects(doc).map(p => Pdf.pageText(doc, p))
      assert(got === want, s"variant=$variant compress=$compress")
    }
    def poke(p: Array[Byte], from: String, to: String): Array[Byte] =
      rebuildXref(new String(p, "ISO-8859-1").replace(from, to))
    def rej(p: Array[Byte], frag: String): Unit = {
      val doc = Pdf.open(p)
      val m = intercept[IllegalArgumentException](
        Pdf.pageObjects(doc).map(pg => Pdf.pageText(doc, pg))).getMessage
      assert(m.contains(frag), m)
    }
    val diff = Pdf.encode(pages, "spec", compress = false,
      indirectLength = false, nestedKids = false, fontVariant = 1)
    // a composite font subtype rejects by name
    rej(poke(diff, "/Subtype /Type1 ", "/Subtype /Type0 "), "/Type0 font")
    // a glyph name outside the Latin subset rejects by name
    rej(poke(diff, "/Differences [97 /z ", "/Differences [97 /Xi "),
      "glyph name /Xi")
    // uniXXXX glyph names parse
    val uni = poke(diff, "/Differences [97 /z ", "/Differences [97 /uni007A ")
    val uniDoc = Pdf.open(uni)
    assert(Pdf.pageObjects(uniDoc).map(p => Pdf.pageText(uniDoc, p)) === want)
    val cmap = Pdf.encode(pages, "spec", compress = false,
      indirectLength = false, nestedKids = false, fontVariant = 2)
    // a 2-byte CMap source code is composite/CID territory: reject
    // (same-length poke — the CMap stream's /Length must hold)
    rej(poke(cmap, "<61> <6D> <006E>", "<0061> <6D> <6E>"), "multi-byte")
    // Tf naming a font absent from declared resources rejects
    rej(poke(diff, "/F1 12 Tf", "/F9 12 Tf"), "/F9 absent")
  }

  test("/Resources inherits from the Pages node (ISO 32000 §7.7.3.4): " +
    "a leaf page without its own resources still maps through the " +
    "ancestor's font encodings") {
    val base = Pdf.encode(pages, "spec", compress = false,
      indirectLength = false, nestedKids = false, fontVariant = 1)
    val t = new String(base, "ISO-8859-1")
    // hoist: move the /Resources entry off the page dicts onto the
    // Pages root (same total length not required — classic xref offsets
    // are rebuilt below by re-encoding the offsets table)
    val resRe = "/Resources << /Font << /F1 3 0 R >> >> "
    assert(t.contains(resRe))
    val doc = Pdf.open(rebuildXref(t
      .replace(resRe, "")
      .replace("/Type /Pages /Kids ", s"/Type /Pages $resRe/Kids ")))
    assert(Pdf.pageObjects(doc).map(p => Pdf.pageText(doc, p)) ===
      pages.map(_.mkString("\n")))
  }

  test("the four show operators and line moves assemble per the pinned " +
    "convention; escapes, octal, nesting and hex strings decode exactly") {
    // hand-written content stream (what a real generator emits)
    val content =
      ("BT /F1 9 Tf 10 700 Td (first) Tj\n" +
        "[(seg one ) -28 (seg two)] TJ\n" +   // no move since Tj: same line
        "0 -12 Td (moved) Tj\n" +
        "(quoted) '\n" +
        "2 1 (dquoted) \"\n" +
        "T* (starred) Tj ET").getBytes("ISO-8859-1")
    assert(Pdf.extractText(content) ===
      "firstseg one seg two\nmoved\nquoted\ndquoted\nstarred")
    // escapes: \( \) \\ \n octal, line continuation, nested parens
    val esc = "BT (a\\(b\\)c\\\\d) Tj (oct \\101\\102) Tj ((nested) ok) Tj ET"
      .getBytes("ISO-8859-1")
    assert(Pdf.extractText(esc) === "a(b)c\\doct AB(nested) ok")
    // hex strings, odd digit count pads a trailing zero nibble
    assert(Pdf.extractText("BT <48492D> Tj ET".getBytes("ISO-8859-1")) === "HI-")
    assert(Pdf.extractText("BT <484) Tj ET".replace(")", ">")
      .getBytes("ISO-8859-1")) === "H@")
  }

  test("crafted and unsupported files reject by name") {
    def rejects(p: Array[Byte], frag: String): Unit = {
      val m = intercept[IllegalArgumentException] {
        val d = Pdf.open(p)
        Pdf.pageObjects(d).foreach(pg => Pdf.pageText(d, pg))
      }.getMessage
      assert(m.contains(frag), m)
    }
    val good = Pdf.encode(pages, "spec", compress = true,
      indirectLength = false, nestedKids = false)
    rejects("not a pdf at all ........................".getBytes, "%PDF-")
    rejects(good.take(good.length / 2), "startxref")
    // lie about startxref → lands mid-file, not at 'xref'
    val s = new String(good, "ISO-8859-1")
    val poked = s.replaceAll("startxref\n\\d+", "startxref\n10")
    rejects(poked.getBytes("ISO-8859-1"), "expected 'xref'")
    // startxref pointing at an object that is NOT an xref stream (the
    // catalog) rejects by name — xref STREAMS themselves parse (see the
    // modern-skeleton test)
    val xs = s.replaceAll("startxref\n\\d+",
      "startxref\n" + s.indexOf("1 0 obj"))
    rejects(xs.getBytes("ISO-8859-1"), "not an xref stream")
    // encryption rejects at open
    val enc = s.replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 9 0 R")
    rejects(enc.getBytes("ISO-8859-1"), "encrypted")
    // an unsupported filter rejects by name at stream decode
    val badFilter = new String(
      Pdf.encode(pages, "spec", compress = false, indirectLength = false,
        nestedKids = false), "ISO-8859-1")
      .replace(">>\nstream", " /Filter /LZWDecode >>\nstream")
    // offsets after the first content dict shift — rebuild via encode is
    // not possible, so only check the error once parsing reaches it
    val m = intercept[Exception] {
      val d = Pdf.open(badFilter.getBytes("ISO-8859-1"))
      Pdf.pageObjects(d).foreach(pg => Pdf.pageText(d, pg))
    }.getMessage
    assert(m.contains("not supported") || m.contains("expected"), m)
  }

  test("modern (PDF 1.5+) skeleton: cross-reference streams, object " +
    "streams and the PNG Up predictor all extract the same text as the " +
    "classic form; incremental updates stack on a modern base") {
    for (objStm <- Seq(false, true); predictor <- Seq(false, true)) {
      val p = Pdf.encodeModern(pages, "modern", objStm = objStm,
        predictor = predictor)
      val doc = Pdf.open(p)
      val classic = Pdf.open(Pdf.encode(pages, "modern", compress = true,
        indirectLength = false, nestedKids = false))
      val got = Pdf.pageObjects(doc).map(pg => Pdf.pageText(doc, pg))
      val want = Pdf.pageObjects(classic).map(pg => Pdf.pageText(classic, pg))
      assert(got === want, s"objStm=$objStm predictor=$predictor")
      assert(Pdf.producerOf(doc) === "modern")
    }
    // a classic incremental update appended on a MODERN base: the newer
    // classic section wins, /Prev walks back into the xref stream
    val base = Pdf.encodeModern(pages, "modern", objStm = true, predictor = true)
    val infoNum = {
      val t = new String(base, "ISO-8859-1")
      val at = t.lastIndexOf("/Info ")
      t.substring(at + 6).trim.takeWhile(_.isDigit).toLong
    }
    val updated = Pdf.appendUpdate(base, infoNum, "<< /Producer (modern r2) >>")
    assert(Pdf.producerOf(Pdf.open(updated)) === "modern r2")
    // crafted modern files reject by name
    def poke(p: Array[Byte], from: String, to: String): Array[Byte] =
      new String(p, "ISO-8859-1").replace(from, to).getBytes("ISO-8859-1")
    val m1 = intercept[IllegalArgumentException](Pdf.open(poke(base,
      "/Predictor 12", "/Predictor 2"))).getMessage
    assert(m1.contains("TIFF predictor"), m1)
    val m2 = intercept[IllegalArgumentException](Pdf.open(poke(base,
      "/W [1 4 2]", "/W [1 4 9]"))).getMessage
    assert(m2.contains("/W widths"), m2)
    // a negative /Index count that nets out under the row gate but lets a
    // later positive subsection overrun must reject by name, not AIOOBE
    val m3 = intercept[IllegalArgumentException](Pdf.open(poke(base,
      "/W [1 4 2]", "/Index [0 -9000 0 9012] /W [1 4 2]"))).getMessage
    assert(m3.contains("negative /Index"), m3)
  }

  test("reference cycles reject by name, not StackOverflowError; a " +
    "multi-part /Contents array joins parts with whitespace") {
    def mini(objs: Seq[(Int, String)]): Array[Byte] = {
      val sb = new StringBuilder("%PDF-1.4\n")
      val offs = objs.map { case (num, body) =>
        val o = sb.length
        sb.append(s"$num 0 obj\n").append(body).append("\nendobj\n")
        num -> o
      }
      val xrefAt = sb.length
      sb.append("xref\n0 1\n0000000000 65535 f \n")
      offs.foreach { case (num, o) =>
        sb.append(s"$num 1\n").append(f"$o%010d 00000 n \n")
      }
      sb.append("trailer\n<< /Root 1 0 R /Size 9 >>\nstartxref\n")
        .append(xrefAt).append("\n%%EOF\n")
      sb.toString.getBytes("ISO-8859-1")
    }
    // value-level ref cycle: object 1's VALUE is a ref to 2, whose value
    // refs 1 — resolve must terminate by name
    val m1 = intercept[IllegalArgumentException](
      Pdf.pageObjects(Pdf.open(mini(Seq(1 -> "2 0 R", 2 -> "1 0 R"))))).getMessage
    assert(m1.contains("circular"), m1)
    // in-flight cycle: a stream whose /Length resolves through its own
    // still-being-parsed object
    val m2 = intercept[IllegalArgumentException](
      Pdf.pageObjects(Pdf.open(mini(Seq(
        1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> "<< /Length 2 0 R >>\nstream\nxx\nendstream"))))).getMessage
    assert(m2.contains("circular") || m2.contains("still being parsed"), m2)
    // multi-part /Contents: both parts extract; a Tj split across the
    // part boundary must NOT fuse (the spec treats parts as
    // whitespace-separated)
    def stream(data: String) = s"<< /Length ${data.length} >>\nstream\n$data\nendstream"
    def contentsPdf(d1: String, d2: String) = mini(Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>",
      4 -> stream(d1), 5 -> stream(d2)))
    val doc = Pdf.open(contentsPdf("BT (Hello) Tj ET", "BT (World) Tj ET"))
    assert(Pdf.pageText(doc, Pdf.pageObjects(doc).head) === "HelloWorld")
    val split = Pdf.open(contentsPdf("BT (Hello) Tj (X) T", "j ET"))
    assert(Pdf.pageText(split, Pdf.pageObjects(split).head) === "Hello")
  }

  test("the Spark ops: planted PDFs → extractPages / docStats agree with " +
    "the word plant on a sample of docs") {
    val docs = Tables.documents(spark, sf).limit(40)
    val pdfs = Pdf.pdfFromDocuments(spark, docs)
    val got = Pdf.extractPages(spark, pdfs).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.page_idx)).toMap
    var sawCompressed = 0
    docs.select("doc_id", "text").as[(Long, String)].collect().foreach {
      case (id, text) =>
        val words = Option(text).getOrElse("").trim.split("\\s+")
          .filter(_.nonEmpty).map(_.map(c => if (c > 0xFF) '?' else c))
        if (words.nonEmpty) {
          val want = words.grouped(12).map(
            _.grouped(4).map(_.mkString(" ")).mkString("\n")).toSeq
          val gp = got(id)
          assert(gp.map(_.text).toSeq === want, s"doc $id")
          assert(gp.map(_.n_words).sum === words.length, s"doc $id")
          if (id % 2 == 0) sawCompressed += 1
        }
    }
    assert(sawCompressed > 0)
    // docMeta alone resolves producers (the metadata-only face)
    Pdf.docMeta(spark, pdfs).collect().foreach { r =>
      assert(r.getString(1) === Pdf.plantProducer(r.getLong(0)))
    }
    val stats = Pdf.docStats(spark, pdfs).collect()
    stats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nw = got(id).map(_.n_words).sum
      assert(r.getAs[Long]("total_words") === nw.toLong)
      assert(r.getAs[Long]("n_pages") === got(id).length.toLong)
      assert(r.getAs[String]("producer") === Pdf.plantProducer(id))
    }
  }

  test("incremental updates (save-in-place /Prev chains) resolve objects " +
    "through the NEWEST xref section; page text is untouched") {
    val base = Pdf.encode(pages, "orig-producer", compress = true,
      indirectLength = false, nestedKids = false)
    assert(Pdf.producerOf(Pdf.open(base)) === "orig-producer")
    val infoNum = {
      val t = new String(base, "ISO-8859-1")
      t.substring(t.lastIndexOf("/Info ") + 6).trim.takeWhile(_.isDigit).toLong
    }
    val updated = Pdf.appendUpdate(base, infoNum, "<< /Producer (second-rev) >>")
    val doc = Pdf.open(updated)
    assert(Pdf.producerOf(doc) === "second-rev")
    assert(Pdf.pageObjects(doc).map(p => Pdf.pageText(doc, p)) ===
      pages.map(_.mkString("\n")))
    // a second update stacks another /Prev link
    val twice = Pdf.appendUpdate(updated, infoNum, "<< /Producer (third-rev) >>")
    assert(Pdf.producerOf(Pdf.open(twice)) === "third-rev")
  }
}
