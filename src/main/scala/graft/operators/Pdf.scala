package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** PDF text extraction — after HTML, the largest non-HTML document
  * source an LLM data pipeline ingests. Covers BOTH generations of the
  * file skeleton (ISO 32000-1):
  *
  *  - the CLASSIC form: startxref→xref-table→trailer (with /Prev
  *    chains), indirect objects, dictionaries/arrays/names/strings
  *    (literal with escapes + octal, and hex), content streams stored
  *    raw or /FlateDecode-compressed (java.util.zip.Inflater — the same
  *    inflate discipline the PNG tier ships), /Length direct or
  *    indirect (common from real writers), the Catalog→Pages tree walk
  *    (nested Pages nodes), and the BT/ET text operators Tj / TJ / ' /
  *    " with Td/TD/T* line moves;
  *  - the MODERN form (PDF 1.5+, what most current writers emit):
  *    cross-reference STREAMS (/Type /XRef — /W-packed big-endian rows,
  *    /Index subsections, the PNG row predictors real writers wrap them
  *    in), OBJECT streams (/Type /ObjStm — header pairs + packed bare
  *    objects, decoded once per container and cached), hybrid files'
  *    /XRefStm (which takes priority over the classic section beside
  *    it, per spec), and classic incremental updates appended on top of
  *    a modern base.
  *
  * Out of the canonical subset and rejecting LOUDLY BY NAME: encrypted
  * files (/Encrypt), filters other than FlateDecode, the TIFF predictor,
  * and ToUnicode CMap remapping (string bytes are decoded as Latin-1,
  * which is exact for the StandardEncoding/WinAnsi ASCII range the
  * plant uses).
  *
  * Text assembly convention (pinned; the fixture replica mirrors it):
  * show-op strings concatenate; a line move (Td, TD, T*, or the moves
  * implied by ' and ") since the previous show op inserts exactly one
  * '\n'; TJ kerning numbers insert nothing. All decode is pure byte
  * discipline — no floats — so extraction is bit-stable.
  *
  * Reference behavior being matched: the reference stores documents as
  * opaque text/blob columns; PDF extraction is a pipeline extension per
  * the brief, wire format from the public ISO 32000-1 spec.
  */
object Pdf {

  // =====================================================================
  // object model
  // =====================================================================
  sealed trait PVal
  case class PNum(v: Double) extends PVal { def toLong: Long = v.toLong }
  case class PStr(bytes: Array[Byte]) extends PVal
  case class PName(v: String) extends PVal
  case class PBool(v: Boolean) extends PVal
  case object PNull extends PVal
  case class PArr(items: Vector[PVal]) extends PVal
  case class PDict(m: Map[String, PVal]) extends PVal
  case class PRef(num: Long, gen: Long) extends PVal
  /** An indirect object holding a stream: its dict + raw stream bytes. */
  case class PStream(dict: PDict, raw: Array[Byte]) extends PVal

  // =====================================================================
  // encode — the planted-fixture writer
  // =====================================================================

  /** Render one page's lines as a content stream. Line 0 sets the text
    * origin; later lines alternate the show operator by line index —
    * j%4==0 Tj, j%4==1 a TJ array (the line split at spaces with
    * planted kerning numbers between segments), j%4==2 the ' operator
    * (implicit T* line move), j%4==3 the " operator (word/char spacing
    * + implicit move). Escape variety is planted in the ENCODING only:
    * `escapeFirst` writes a string's first byte as an octal escape and
    * `hexLines` renders whole lines as hex strings — both decode to the
    * identical text, so the replica never needs to know.
    */
  def renderContent(lines: Seq[String], escapeFirst: Boolean,
                    hexLines: Boolean): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("BT\n/F1 12 Tf\n72 720 Td\n")
    lines.zipWithIndex.foreach { case (line, j) =>
      def lit(s: String, octFirst: Boolean): String = {
        val b = new StringBuilder("(")
        s.zipWithIndex.foreach { case (c, i) =>
          if (i == 0 && octFirst && c < 0x80)
            b.append(f"\\${c.toInt}%03o")
          else c match {
            case '(' => b.append("\\(")
            case ')' => b.append("\\)")
            case '\\' => b.append("\\\\")
            case other => b.append(other)
          }
        }
        b.append(")").toString
      }
      def hex(s: String): String =
        s.getBytes("ISO-8859-1").map(b => f"${b & 0xff}%02X")
          .mkString("<", "", ">")
      def str(s: String): String =
        if (hexLines) hex(s) else lit(s, escapeFirst)
      if (j > 0 && j % 4 != 2 && j % 4 != 3) sb.append("0 -14 Td\n")
      j % 4 match {
        case 1 =>
          // TJ: split at spaces, kerning numbers between segments; the
          // SPACE stays inside the leading segment so decoded text is
          // identical
          val parts = {
            val words = line.split(" ", -1)
            words.zipWithIndex.map { case (w, i) =>
              if (i < words.length - 1) w + " " else w
            }.filter(_.nonEmpty).toSeq
          }
          sb.append(parts.map(p => str(p)).mkString("[", " -28 ", s"] TJ\n"))
        case 2 => sb.append(s"${str(line)} '\n")
        case 3 => sb.append(s"1 0 ${str(line)} \"\n")
        case _ => sb.append(s"${str(line)} Tj\n")
      }
    }
    sb.append("ET\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** The planted font re-encodings: variant 1 shifts lowercase codes by
    * +1 (wrapping z→a) and declares the inverse in /Differences; variant
    * 2 rot13s lowercase codes and declares the inverse in a /ToUnicode
    * CMap (two contiguous bfranges + a bfchar). Both decode back to the
    * ORIGINAL text, so every fixture replica stays plant-formula-only.
    */
  private def fontShift(variant: Int, s: String): String = variant match {
    case 1 => s.map(c => if (c >= 'a' && c <= 'z') ('a' + (c - 'a' + 1) % 26).toChar else c)
    case 2 => s.map(c => if (c >= 'a' && c <= 'z') ('a' + (c - 'a' + 13) % 26).toChar else c)
    case _ => s
  }

  /** Write one classic PDF. Wire-form variety is the caller's to plant:
    * `compress` Flate-encodes content streams, `indirectLength` stores
    * each stream's /Length as a separate indirect object, `nestedKids`
    * routes all pages through one intermediate Pages node, `fontVariant`
    * re-encodes lowercase text through /Differences (1) or a /ToUnicode
    * CMap (2) per [[fontShift]].
    */
  def encode(pages0: Seq[Seq[String]], producer: String,
             compress: Boolean, indirectLength: Boolean,
             nestedKids: Boolean,
             escapeFirst: Boolean = false, hexLines: Boolean = false,
             fontVariant: Int = 0): Array[Byte] = {
    val pages = pages0.map(_.map(fontShift(fontVariant, _)))
    require(pages.nonEmpty, "Pdf.encode: no pages")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (num, off)
    def obj(num: Long)(body: => Unit): Unit = {
      offsets += ((num, out.size().toLong))
      w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n%âãÏÓ\n")
    val n = pages.length
    // numbering: 1 catalog, 2 pages root, 3 font, [4 nested node],
    // then per page: page obj, content obj, [length obj]; info last
    val font = 3L
    val nested = if (nestedKids) Some(4L) else None
    var next = if (nestedKids) 5L else 4L
    val pageNums = pages.map { _ =>
      val p = next
      next += (if (indirectLength) 3 else 2)
      p
    }
    val info = next
    val parentOf = nested.getOrElse(2L)

    obj(1L)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    val kidsList = pageNums.map(p => s"$p 0 R").mkString("[", " ", "]")
    obj(2L) {
      val kids = nested.map(nn => s"[$nn 0 R]").getOrElse(kidsList)
      w(s"<< /Type /Pages /Kids $kids /Count $n >>\n")
    }
    val cmapNum = info + 1 // only written for fontVariant 2
    fontVariant match {
      case 1 =>
        // /Differences: code 'a' carries glyph z, then b..z carry a..y —
        // consecutive codes need only the one leading number
        val names = "/z " + ('a' to 'y').map("/" + _).mkString(" ")
        obj(font)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          "/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding " +
          s"/Differences [97 $names] >> >>\n"))
      case 2 =>
        obj(font)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          s"/ToUnicode $cmapNum 0 R >>\n"))
      case _ =>
        obj(font)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"))
    }
    nested.foreach { nn =>
      obj(nn)(w(s"<< /Type /Pages /Parent 2 0 R /Kids $kidsList /Count $n >>\n"))
    }
    pages.zip(pageNums).foreach { case (lines, p) =>
      val contentNum = p + 1
      obj(p) {
        w(s"<< /Type /Page /Parent $parentOf 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 $font 0 R >> >> /Contents $contentNum 0 R >>\n")
      }
      val plain = renderContent(lines, escapeFirst, hexLines)
      val data = if (compress) deflate(plain) else plain
      val lenVal = if (indirectLength) s"${p + 2} 0 R" else data.length.toString
      val filter = if (compress) " /Filter /FlateDecode" else ""
      obj(contentNum) {
        w(s"<< /Length $lenVal$filter >>\nstream\n")
        out.write(data)
        w("\nendstream\n")
      }
      if (indirectLength) obj(p + 2)(w(s"${data.length}\n"))
    }
    obj(info)(w(s"<< /Producer (${producer}) >>\n"))
    if (fontVariant == 2) {
      // rot13 inverse as a CMap: codes n..z carry a..m, a..m carry n..z
      val cmap =
        """/CIDInit /ProcSet findresource begin
          |12 dict begin
          |begincmap
          |/CMapName /graft-rot13 def
          |/CMapType 2 def
          |1 begincodespacerange
          |<00> <FF>
          |endcodespacerange
          |2 beginbfrange
          |<61> <6D> <006E>
          |<6E> <7A> <0061>
          |endbfrange
          |1 beginbfchar
          |<20> <0020>
          |endbfchar
          |endcmap
          |CMapName currentdict /CMap defineresource pop
          |end
          |end""".stripMargin.getBytes("ISO-8859-1")
      obj(cmapNum) {
        w(s"<< /Length ${cmap.length} >>\nstream\n")
        out.write(cmap)
        w("\nendstream\n")
      }
    }

    val xrefAt = out.size().toLong
    val sorted = offsets.sortBy(_._1)
    w(s"xref\n0 ${sorted.length + 1}\n")
    w("0000000000 65535 f \n")
    sorted.foreach { case (_, off) => w(f"$off%010d 00000 n \n") }
    w(s"trailer\n<< /Size ${sorted.length + 1} /Root 1 0 R /Info $info 0 R >>\n")
    w(s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Write one MODERN (PDF 1.5+) file: a cross-reference STREAM instead
    * of the classic table — /W [1 4 2] rows, Flate, optionally wrapped
    * in the PNG Up predictor real writers use — and, with `objStm`, the
    * non-stream objects (catalog, pages, font, page dicts, info) packed
    * into one object stream referenced by type-2 entries. Content
    * streams stay direct (streams cannot live inside an ObjStm).
    */
  def encodeModern(pages: Seq[Seq[String]], producer: String,
                   objStm: Boolean, predictor: Boolean,
                   escapeFirst: Boolean = false,
                   hexLines: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "Pdf.encode: no pages")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n%âãÏÓ\n")
    val n = pages.length
    // numbering: 1 catalog, 2 pages root, 3 font, per page (page, content),
    // info, [objstm], xref stream last
    var next = 4L
    val pageNums = pages.map { _ => val p = next; next += 2; p }
    val info = next; next += 1
    val stmNum = if (objStm) { val s = next; next += 1; s } else -1L
    val xrefNum = next
    val size = next + 1
    val entries = scala.collection.mutable.Map.empty[Long, Either[Long, (Long, Int)]]
    val kidsList = pageNums.map(p => s"$p 0 R").mkString("[", " ", "]")
    val dictBodies: Seq[(Long, String)] = Seq(
      1L -> "<< /Type /Catalog /Pages 2 0 R >>",
      2L -> s"<< /Type /Pages /Kids $kidsList /Count $n >>",
      3L -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") ++
      pageNums.map { p =>
        p -> (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${p + 1} 0 R >>")
      } ++ Seq(info -> s"<< /Producer ($producer) >>")
    // content streams: always direct objects
    pages.zip(pageNums).foreach { case (lines, p) =>
      val data = deflate(renderContent(lines, escapeFirst, hexLines))
      entries(p + 1) = Left(out.size().toLong)
      w(s"${p + 1} 0 obj\n<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    if (objStm) {
      // pack the dict objects into one object stream
      val bodies = dictBodies.map(_._2 + "\n")
      val offs = bodies.scanLeft(0)(_ + _.getBytes("ISO-8859-1").length).init
      val header = dictBodies.map(_._1).zip(offs)
        .map { case (num, o) => s"$num $o" }.mkString(" ") + "\n"
      val first = header.getBytes("ISO-8859-1").length
      val plain = (header + bodies.mkString).getBytes("ISO-8859-1")
      val data = deflate(plain)
      dictBodies.map(_._1).zipWithIndex.foreach { case (num, i) =>
        entries(num) = Right((stmNum, i))
      }
      entries(stmNum) = Left(out.size().toLong)
      w(s"$stmNum 0 obj\n<< /Type /ObjStm /N ${dictBodies.length} /First $first " +
        s"/Length ${data.length} /Filter /FlateDecode >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    } else {
      dictBodies.foreach { case (num, body) =>
        entries(num) = Left(out.size().toLong)
        w(s"$num 0 obj\n$body\nendobj\n")
      }
    }
    // the cross-reference stream (its own entry included)
    val xrefAt = out.size().toLong
    entries(xrefNum) = Left(xrefAt)
    val rowLen = 7 // W = [1 4 2]
    val raw = new Array[Byte](size.toInt * rowLen)
    def putRow(num: Int, t: Int, f2: Long, f3: Int): Unit = {
      val p = num * rowLen
      raw(p) = t.toByte
      raw(p + 1) = ((f2 >> 24) & 0xff).toByte; raw(p + 2) = ((f2 >> 16) & 0xff).toByte
      raw(p + 3) = ((f2 >> 8) & 0xff).toByte; raw(p + 4) = (f2 & 0xff).toByte
      raw(p + 5) = ((f3 >> 8) & 0xff).toByte; raw(p + 6) = (f3 & 0xff).toByte
    }
    putRow(0, 0, 0, 0xffff)
    (1L until size).foreach { num =>
      entries.get(num) match {
        case Some(Left(off)) => putRow(num.toInt, 1, off, 0)
        case Some(Right((c, i))) => putRow(num.toInt, 2, c, i)
        case None => putRow(num.toInt, 0, 0, 0)
      }
    }
    val predicted =
      if (!predictor) raw
      else {
        // PNG Up filter per row — the wrapping real writers emit
        val rows = raw.length / rowLen
        val o = new Array[Byte]((rowLen + 1) * rows)
        var r = 0
        while (r < rows) {
          o(r * (rowLen + 1)) = 2 // Up
          var i = 0
          while (i < rowLen) {
            val prior = if (r > 0) raw((r - 1) * rowLen + i) & 0xff else 0
            o(r * (rowLen + 1) + 1 + i) = (((raw(r * rowLen + i) & 0xff) - prior) & 0xff).toByte
            i += 1
          }
          r += 1
        }
        o
      }
    val data = deflate(predicted)
    val parms = if (predictor) s" /DecodeParms << /Predictor 12 /Columns $rowLen >>" else ""
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /W [1 4 2] /Root 1 0 R " +
      s"/Info $info 0 R /Filter /FlateDecode$parms /Length ${data.length} >>\nstream\n")
    out.write(data)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  // =====================================================================
  // parse — lexer + object reader + xref walk
  // =====================================================================

  private def isWs(b: Int): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == 0 || b == 12
  private def isDelim(b: Int): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'

  /** Byte-level cursor over the payload with PDF token reads. */
  private final class Lex(val p: Array[Byte], var at: Int) {
    def n: Int = p.length
    def peek: Int = if (at < n) p(at) & 0xff else -1
    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (at < n && isWs(p(at) & 0xff)) at += 1
        if (at < n && (p(at) & 0xff) == '%') { // comment to EOL
          while (at < n && p(at) != '\n' && p(at) != '\r') at += 1
        } else go = false
      }
    }
    def token(): String = {
      skipWs()
      require(at < n, "Pdf.parse: unexpected end of file")
      val b = peek
      if (isDelim(b)) {
        if (b == '<' && at + 1 < n && (p(at + 1) & 0xff) == '<') { at += 2; "<<" }
        else if (b == '>' && at + 1 < n && (p(at + 1) & 0xff) == '>') { at += 2; ">>" }
        else { at += 1; b.toChar.toString }
      } else {
        val s = at
        while (at < n && !isWs(p(at) & 0xff) && !isDelim(p(at) & 0xff)) at += 1
        new String(p, s, at - s, "ISO-8859-1")
      }
    }
    def expect(t: String): Unit = {
      val got = token()
      require(got == t, s"Pdf.parse: expected '$t', found '$got' near offset $at")
    }
    /** Literal string body after '(' — nesting, escapes, octal. */
    def literalString(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        require(at < n, "Pdf.parse: unterminated literal string")
        val c = p(at) & 0xff; at += 1
        c match {
          case '\\' =>
            require(at < n, "Pdf.parse: dangling backslash in string")
            val e = p(at) & 0xff; at += 1
            e match {
              case 'n' => out.write('\n'); case 'r' => out.write('\r')
              case 't' => out.write('\t'); case 'b' => out.write('\b')
              case 'f' => out.write(12)
              case '(' => out.write('('); case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (at < n && p(at) == '\n') at += 1 // line continuation
              case '\n' => ()
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'; var k = 0
                while (k < 2 && at < n && p(at) >= '0' && p(at) <= '7') {
                  v = v * 8 + (p(at) - '0'); at += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // spec: backslash ignored
            }
          case '(' => depth += 1; out.write('(')
          case ')' => depth -= 1; if (depth > 0) out.write(')')
          case other => out.write(other)
        }
      }
      out.toByteArray
    }
    /** Hex string body after '<'. */
    def hexString(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        require(at < n, "Pdf.parse: unterminated hex string")
        val c = p(at) & 0xff; at += 1
        if (c == '>') {
          if (hi >= 0) out.write(hi << 4) // odd count: trailing 0 (spec)
          done = true
        } else if (!isWs(c)) {
          val v = Character.digit(c, 16)
          require(v >= 0, s"Pdf.parse: bad hex digit '${c.toChar}' in string")
          if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
        }
      }
      out.toByteArray
    }
  }

  /** Parse one value at the cursor (dict/array/name/number/string/ref/
    * bool/null). Refs need lookahead over two numbers + 'R'.
    */
  private def value(lx: Lex): PVal = {
    lx.skipWs()
    val b = lx.peek
    if (b == '<' && lx.at + 1 < lx.n && (lx.p(lx.at + 1) & 0xff) == '<') {
      lx.at += 2
      val m = scala.collection.mutable.Map.empty[String, PVal]
      var done = false
      while (!done) {
        lx.skipWs()
        if (lx.peek == '>' ) { lx.expect(">>"); done = true }
        else {
          lx.expect("/")
          val key = lx.token()
          m(key) = value(lx)
        }
      }
      PDict(m.toMap)
    } else if (b == '<') { lx.at += 1; PStr(lx.hexString()) }
    else if (b == '(') { lx.at += 1; PStr(lx.literalString()) }
    else if (b == '/') { lx.at += 1; PName(lx.token()) }
    else if (b == '[') {
      lx.at += 1
      val items = Vector.newBuilder[PVal]
      var done = false
      while (!done) {
        lx.skipWs()
        if (lx.peek == ']') { lx.at += 1; done = true }
        else items += value(lx)
      }
      PArr(items.result())
    } else {
      val t = lx.token()
      t match {
        case "true" => PBool(true)
        case "false" => PBool(false)
        case "null" => PNull
        case num if num.nonEmpty &&
          (num(0).isDigit || num(0) == '+' || num(0) == '-' || num(0) == '.') =>
          // possible "N G R" reference: two non-negative integers + R
          if (num.forall(_.isDigit)) {
            val save = lx.at
            lx.skipWs()
            val save2 = lx.at
            val t2 = if (lx.at < lx.n) lx.token() else ""
            if (t2.nonEmpty && t2.forall(_.isDigit)) {
              lx.skipWs()
              val save3 = lx.at
              val t3 = if (lx.at < lx.n) lx.token() else ""
              if (t3 == "R") PRef(num.toLong, t2.toLong)
              else { lx.at = save3; lx.at = save; PNum(num.toDouble) }
            } else { lx.at = save2; lx.at = save; PNum(num.toDouble) }
          } else PNum(num.toDouble)
        case other =>
          throw new IllegalArgumentException(
            s"Pdf.parse: unexpected token '$other' near offset ${lx.at}")
      }
    }
  }

  /** Parse one indirect object at a byte offset ("num gen obj ...
    * endobj", stream bodies included). `wantNum` < 0 accepts any object
    * number (the xref-stream bootstrap, which cannot know it yet);
    * `lengthResolver` resolves an indirect /Length — the bootstrap
    * passes a strict resolver because nothing can be resolved before
    * the xref exists.
    */
  private def parseObjectAt(payload: Array[Byte], off: Long, wantNum: Long,
                            lengthResolver: PVal => PVal): PVal = {
    val lx = new Lex(payload, off.toInt)
    val numTok = lx.token()
    require(numTok.forall(_.isDigit) && (wantNum < 0 || numTok.toLong == wantNum),
      s"Pdf.parse: xref offset $off holds object '$numTok', wanted $wantNum")
    lx.token() // generation
    lx.expect("obj")
    val v = value(lx)
    lx.skipWs()
    v match {
      case d: PDict if lx.at + 6 <= lx.n &&
          new String(payload, lx.at, 6, "ISO-8859-1") == "stream" =>
        lx.at += 6
        // EOL after 'stream': CRLF or LF (spec)
        if (lx.peek == '\r') lx.at += 1
        if (lx.peek == '\n') lx.at += 1
        val len = lengthResolver(d.m.getOrElse("Length",
          throw new IllegalArgumentException("Pdf.parse: stream without /Length"))) match {
          case PNum(nv) => nv.toLong
          case other => throw new IllegalArgumentException(
            s"Pdf.parse: /Length resolves to $other")
        }
        require(len >= 0 && lx.at + len <= lx.n,
          s"Pdf.parse: stream of $len bytes overruns the payload")
        val raw = java.util.Arrays.copyOfRange(payload, lx.at, lx.at + len.toInt)
        PStream(d, raw)
      case other => other
    }
  }

  /** Undo the PNG row predictor (/Predictor >= 10) over 8-bit
    * single-component rows — what real writers wrap xref streams in.
    */
  private def pngDefilter(data: Array[Byte], columns: Int): Array[Byte] = {
    require(columns > 0, s"Pdf.parse: predictor /Columns $columns")
    val stride = columns + 1
    require(data.length % stride == 0,
      s"Pdf.parse: predicted stream of ${data.length} bytes is not a " +
        s"multiple of the ${stride}-byte row stride")
    val rows = data.length / stride
    val out = new Array[Byte](rows * columns)
    var r = 0
    while (r < rows) {
      val f = data(r * stride) & 0xff
      var i = 0
      while (i < columns) {
        val cur = data(r * stride + 1 + i) & 0xff
        val left = if (i > 0) out(r * columns + i - 1) & 0xff else 0
        val up = if (r > 0) out((r - 1) * columns + i) & 0xff else 0
        val ul = if (r > 0 && i > 0) out((r - 1) * columns + i - 1) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case other => throw new IllegalArgumentException(
            s"Pdf.parse: PNG predictor row filter $other (0..4)")
        }
        out(r * columns + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  /** Decode a stream's bytes: /Filter (none or FlateDecode), then
    * /DecodeParms (none, or the PNG row predictors real xref/object
    * streams use; TIFF predictor 2 rejects by name).
    */
  private def decodeStream(s: PStream, resolver: PVal => PVal): Array[Byte] = {
    val raw = s.dict.m.get("Filter").map(resolver) match {
      case None => s.raw
      case Some(PName("FlateDecode")) =>
        val inf = new java.util.zip.Inflater()
        inf.setInput(s.raw)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        try {
          while (!inf.finished()) {
            val got = inf.inflate(buf)
            require(got > 0 || inf.finished() || !inf.needsInput(),
              "Pdf.parse: truncated FlateDecode stream")
            out.write(buf, 0, got)
          }
        } finally inf.end()
        out.toByteArray
      case Some(other) => throw new IllegalArgumentException(
        s"Pdf.parse: filter $other not supported (FlateDecode only)")
    }
    s.dict.m.get("DecodeParms").orElse(s.dict.m.get("DP")).map(resolver) match {
      case None | Some(PNull) => raw
      case Some(d: PDict) =>
        def num(k: String, dflt: Long): Long = d.m.get(k).map(resolver) match {
          case Some(PNum(v)) => v.toLong
          case None => dflt
          case other => throw new IllegalArgumentException(
            s"Pdf.parse: /DecodeParms $k is $other")
        }
        num("Predictor", 1) match {
          case 1 => raw
          case p if p >= 10 =>
            require(num("Colors", 1) == 1 && num("BitsPerComponent", 8) == 8,
              "Pdf.parse: PNG predictor with multi-component rows not supported")
            pngDefilter(raw, num("Columns", 1).toInt)
          case 2 => throw new IllegalArgumentException(
            "Pdf.parse: TIFF predictor 2 not supported (PNG predictors only)")
          case other => throw new IllegalArgumentException(
            s"Pdf.parse: predictor $other not supported")
        }
      case Some(other) => throw new IllegalArgumentException(
        s"Pdf.parse: /DecodeParms is $other, not a dictionary")
    }
  }

  /** A parsed document: object fetch-by-ref (direct xref offsets AND
    * object-stream members) plus the trailer dict.
    */
  final class Doc(payload: Array[Byte], xref: Map[Long, Long],
                  compressed: Map[Long, (Long, Int)], val trailer: PDict) {
    private val cache = scala.collection.mutable.Map.empty[Long, PVal]
    // objects currently BEING fetched: a crafted document whose object
    // reaches itself while still parsing (e.g. a /Length chain back to the
    // stream's own object) must reject by name, not StackOverflowError
    private val inFlight = scala.collection.mutable.Set.empty[Long]
    def fetch(ref: PRef): PVal = cache.get(ref.num) match {
      case Some(v) => v
      case None =>
        require(inFlight.add(ref.num),
          s"Pdf.parse: circular reference — object ${ref.num} reached " +
            "while still being parsed")
        try fetchUncached(ref) finally inFlight.remove(ref.num)
    }
    private def fetchUncached(ref: PRef): PVal = cache.getOrElseUpdate(ref.num, {
      xref.get(ref.num) match {
        case Some(off) => parseObjectAt(payload, off, ref.num, resolve)
        case None => compressed.get(ref.num) match {
          case Some((container, idx)) => fetchFromObjStm(container, idx, ref.num)
          case None => throw new IllegalArgumentException(
            s"Pdf.parse: object ${ref.num} not in xref")
        }
      }
    })
    // decoded object-stream containers, parsed once per container: the
    // (objnum, offset) header pairs + decoded bytes + /First
    private val objStmCache =
      scala.collection.mutable.Map.empty[Long, (Array[(Long, Long)], Array[Byte], Long)]
    private def fetchFromObjStm(container: Long, idx: Int, want: Long): PVal = {
      val (pairs, data, first) = objStmCache.getOrElseUpdate(container, {
        val s = resolve(PRef(container, 0)) match {
          case s: PStream => s
          case other => throw new IllegalArgumentException(
            s"Pdf.parse: object-stream container $container is $other, not a stream")
        }
        require(s.dict.m.get("Type").map(resolve).contains(PName("ObjStm")),
          s"Pdf.parse: container $container is not /Type /ObjStm")
        val d = streamData(s)
        def num(k: String): Long = resolve(s.dict.m.getOrElse(k,
          throw new IllegalArgumentException(s"Pdf.parse: ObjStm without /$k"))) match {
          case PNum(v) => v.toLong
          case other => throw new IllegalArgumentException(
            s"Pdf.parse: ObjStm /$k is $other")
        }
        val nObjs = num("N")
        val first = num("First")
        require(nObjs >= 0 && nObjs <= d.length && first >= 0 && first <= d.length,
          s"Pdf.parse: ObjStm header ($nObjs objects, first $first) overruns " +
            s"its ${d.length}-byte data")
        val lx = new Lex(d, 0)
        val pairs = (0L until nObjs).map { _ =>
          val numTok = lx.token(); val offTok = lx.token()
          require(numTok.forall(_.isDigit) && offTok.forall(_.isDigit),
            s"Pdf.parse: non-numeric ObjStm header pair '$numTok $offTok'")
          (numTok.toLong, offTok.toLong)
        }
        (pairs.toArray, d, first)
      })
      require(idx >= 0 && idx < pairs.length,
        s"Pdf.parse: object-stream index $idx outside container $container " +
          s"(${pairs.length} members)")
      val (num, off) = pairs(idx)
      require(num == want,
        s"Pdf.parse: ObjStm slot $idx holds object $num, xref wanted $want")
      require(first + off < data.length,
        s"Pdf.parse: ObjStm member offset ${first + off} overruns the data")
      // members are bare values: no obj/endobj wrapper, never streams
      value(new Lex(data, (first + off).toInt))
    }
    def resolve(v: PVal): PVal = v match {
      case r0: PRef =>
        // ref→ref chains must terminate: a cached object whose VALUE is
        // a reference back into the chain ("5 0 obj 5 0 R endobj") would
        // spin forever (fetch's inFlight can't see it — the object
        // parses fine; the cycle is in the resolved values). A depth
        // bound beats a seen-set: resolve runs on every dictionary
        // access and must not allocate.
        var cur: PVal = fetch(r0)
        var depth = 1
        while (cur.isInstanceOf[PRef]) {
          depth += 1
          require(depth <= 64,
            "Pdf.parse: circular (or >64-deep) reference chain")
          cur = fetch(cur.asInstanceOf[PRef])
        }
        cur
      case other => other
    }
    /** Decode a stream object's bytes through its /Filter + /DecodeParms. */
    def streamData(s: PStream): Array[Byte] = decodeStream(s, resolve)
  }

  /** Open a document: tail startxref, then the xref chain — classic
    * tables AND cross-reference streams (PDF 1.5+), /Prev links, and
    * hybrid files' /XRefStm (whose entries take priority over the
    * classic section beside them, per spec). Rejects encryption by name.
    */
  def open(payload: Array[Byte]): Doc = {
    val n = payload.length
    require(n >= 32 && new String(payload, 0, 5, "ISO-8859-1") == "%PDF-",
      s"Pdf.parse: not a PDF payload (no %PDF- header in $n bytes)")
    // find the LAST 'startxref' in the tail window
    val tail = new String(payload, math.max(0, n - 2048), math.min(2048, n), "ISO-8859-1")
    val sxAt = tail.lastIndexOf("startxref")
    require(sxAt >= 0, "Pdf.parse: no startxref in the file tail")
    val sxLex = new Lex(payload, math.max(0, n - 2048) + sxAt + "startxref".length)
    val firstXref = {
      val t = sxLex.token()
      require(t.forall(_.isDigit), s"Pdf.parse: bad startxref offset '$t'")
      t.toLong
    }
    val xref = scala.collection.mutable.Map.empty[Long, Long]
    val compressed = scala.collection.mutable.Map.empty[Long, (Long, Int)]
    def absorb(num: Long, e: Either[Long, (Long, Int)]): Unit =
      if (!xref.contains(num) && !compressed.contains(num)) e match {
        case Left(off) => xref(num) = off
        case Right(ci) => compressed(num) = ci
      }
    // nothing is resolvable while the xref is still being built
    val strict: PVal => PVal = {
      case r: PRef => throw new IllegalArgumentException(
        s"Pdf.parse: xref stream carries an indirect value ($r) — " +
          "must be direct before the xref exists")
      case v => v
    }
    /** One cross-reference STREAM section: /W-packed big-endian entry
      * rows (PNG predictors handled by decodeStream), /Index subsections.
      * Returns the stream dict (trailer fields live there).
      */
    def readXrefStream(off: Long): PDict = {
      val s = parseObjectAt(payload, off, -1, strict) match {
        case s: PStream => s
        case other => throw new IllegalArgumentException(
          s"Pdf.parse: startxref/Prev points at $other, not an xref stream")
      }
      require(s.dict.m.get("Type").contains(PName("XRef")),
        "Pdf.parse: stream at the xref offset is not /Type /XRef")
      val data = decodeStream(s, strict)
      def num(k: String): Option[Long] = s.dict.m.get(k).map {
        case PNum(v) => v.toLong
        case other => throw new IllegalArgumentException(
          s"Pdf.parse: xref stream /$k is $other")
      }
      val size = num("Size").getOrElse(throw new IllegalArgumentException(
        "Pdf.parse: xref stream without /Size"))
      val w = s.dict.m.get("W") match {
        case Some(PArr(items)) if items.length == 3 => items.map {
          case PNum(v) => v.toInt
          case other => throw new IllegalArgumentException(
            s"Pdf.parse: xref stream /W field is $other")
        }
        case other => throw new IllegalArgumentException(
          s"Pdf.parse: xref stream /W is $other (need [w1 w2 w3])")
      }
      require(w.forall(x => x >= 0 && x <= 8),
        s"Pdf.parse: xref stream /W widths $w (0..8 bytes)")
      val rowLen = w.sum
      require(rowLen > 0, "Pdf.parse: xref stream with zero-width rows")
      val index: Seq[(Long, Long)] = s.dict.m.get("Index") match {
        case None => Seq((0L, size))
        case Some(PArr(items)) =>
          require(items.length % 2 == 0, "Pdf.parse: odd /Index array")
          items.map {
            case PNum(v) => v.toLong
            case other => throw new IllegalArgumentException(
              s"Pdf.parse: /Index item is $other")
          }.grouped(2).map { p =>
            require(p(0) >= 0 && p(1) >= 0,
              s"Pdf.parse: negative /Index subsection (${p(0)}, ${p(1)})")
            (p(0), p(1))
          }.toSeq
        case Some(other) => throw new IllegalArgumentException(
          s"Pdf.parse: /Index is $other")
      }
      val totalRows = index.map(_._2).sum
      require(totalRows >= 0 && totalRows * rowLen <= data.length,
        s"Pdf.parse: xref stream declares $totalRows rows of $rowLen bytes " +
          s"in ${data.length} decoded bytes")
      var p = 0
      index.foreach { case (start, count) =>
        var i = 0L
        while (i < count) {
          def field(width: Int): Long = {
            var v = 0L
            var k = 0
            while (k < width) { v = (v << 8) | (data(p) & 0xffL); p += 1; k += 1 }
            v
          }
          val t = if (w(0) == 0) 1L else field(w(0))
          val f2 = field(w(1))
          val f3 = field(w(2))
          t match {
            case 0 => () // free
            case 1 => absorb(start + i, Left(f2))
            case 2 =>
              require(f3 <= Int.MaxValue,
                s"Pdf.parse: ObjStm index $f3 out of range")
              absorb(start + i, Right((f2, f3.toInt)))
            case other => throw new IllegalArgumentException(
              s"Pdf.parse: xref stream entry type $other (0/1/2)")
          }
          i += 1
        }
      }
      PDict(s.dict.m)
    }
    var trailer: Option[PDict] = None
    var nextOff: Option[Long] = Some(firstXref)
    val seen = scala.collection.mutable.Set.empty[Long]
    while (nextOff.isDefined) {
      val off = nextOff.get
      require(seen.add(off), s"Pdf.parse: circular /Prev xref chain at $off")
      require(off >= 0 && off < n, s"Pdf.parse: xref offset $off outside the payload")
      val lx = new Lex(payload, off.toInt)
      val kw = lx.token()
      val tdict: PDict =
        if (kw.nonEmpty && kw.forall(_.isDigit)) readXrefStream(off)
        else {
          require(kw == "xref",
            s"Pdf.parse: expected 'xref' at offset $off, found '$kw'")
          // classic section: collect LOCALLY first — a hybrid file's
          // /XRefStm entries take priority over the section beside them
          val local = scala.collection.mutable.Map.empty[Long, Long]
          var scanning = true
          while (scanning) {
            lx.skipWs()
            val t = lx.token()
            if (t == "trailer") scanning = false
            else {
              require(t.forall(_.isDigit), s"Pdf.parse: bad xref subsection start '$t'")
              val start = t.toLong
              val count = lx.token().toLong
              (0L until count).foreach { i =>
                lx.skipWs()
                val entry = new String(payload, lx.at, 18, "ISO-8859-1")
                lx.at += 18
                val eoff = entry.substring(0, 10).toLong
                val kind = entry.charAt(17)
                if (kind == 'n' && !local.contains(start + i)) local(start + i) = eoff
              }
            }
          }
          val td = value(lx) match {
            case d: PDict => d
            case other => throw new IllegalArgumentException(
              s"Pdf.parse: trailer is $other, not a dictionary")
          }
          td.m.get("XRefStm").foreach {
            case PNum(v) => readXrefStream(v.toLong) // before the classic entries
            case other => throw new IllegalArgumentException(
              s"Pdf.parse: /XRefStm is $other, not an offset")
          }
          local.foreach { case (k, v) => absorb(k, Left(v)) }
          td
        }
      require(!tdict.m.contains("Encrypt"),
        "Pdf.parse: encrypted PDF not supported")
      if (trailer.isEmpty) trailer = Some(tdict)
      nextOff = tdict.m.get("Prev").map {
        case PNum(v) => v.toLong
        case other => throw new IllegalArgumentException(
          s"Pdf.parse: /Prev is $other, not an offset")
      }
    }
    require(trailer.exists(_.m.contains("Root")),
      "Pdf.parse: trailer has no /Root catalog")
    new Doc(payload, xref.toMap, compressed.toMap, trailer.get)
  }

  /** Walk the page tree to the leaf /Page objects, in document order.
    * /Resources is an INHERITABLE attribute (ISO 32000 §7.7.3.4): a leaf
    * without its own inherits the nearest ancestor's — real writers
    * (LaTeX among them) routinely hoist shared font resources onto the
    * Pages node, so a page-local-only read would silently lose the font
    * encodings. The returned leaf dicts carry the inherited entry
    * merged in.
    */
  def pageObjects(doc: Doc): Seq[PDict] = {
    val root = doc.resolve(doc.trailer.m("Root")) match {
      case d: PDict => d
      case other => throw new IllegalArgumentException(
        s"Pdf.parse: catalog is $other")
    }
    val pagesRoot = doc.resolve(root.m.getOrElse("Pages",
      throw new IllegalArgumentException("Pdf.parse: catalog has no /Pages")))
    val out = scala.collection.mutable.ArrayBuffer.empty[PDict]
    def walk(node: PVal, depth: Int, inheritedRes: Option[PVal]): Unit = {
      require(depth < 64, "Pdf.parse: page tree deeper than 64 levels")
      doc.resolve(node) match {
        case d: PDict => d.m.get("Type").map(doc.resolve) match {
          case Some(PName("Pages")) =>
            val res = d.m.get("Resources").orElse(inheritedRes)
            d.m.get("Kids").map(doc.resolve) match {
              case Some(PArr(kids)) => kids.foreach(walk(_, depth + 1, res))
              case other => throw new IllegalArgumentException(
                s"Pdf.parse: Pages node /Kids is $other")
            }
          case Some(PName("Page")) =>
            out += (if (d.m.contains("Resources")) d
              else inheritedRes.fold(d)(r => PDict(d.m + ("Resources" -> r))))
          case other => throw new IllegalArgumentException(
            s"Pdf.parse: page-tree node of type $other")
        }
        case other => throw new IllegalArgumentException(
          s"Pdf.parse: page-tree node is $other")
      }
    }
    walk(pagesRoot, 0, None)
    require(out.nonEmpty, "Pdf.parse: page tree has no /Page leaves")
    out.toSeq
  }

  // =====================================================================
  // simple-font encodings: /Differences + /ToUnicode
  // =====================================================================

  /** Adobe-glyph-list subset for the printable Latin range: letters and
    * digits name themselves or spell out; punctuation by its AGL name;
    * `uniXXXX` forms parse directly. A glyph name outside the subset
    * REJECTS BY NAME — mapping it to garbage would poison training text
    * exactly where a named rejection is cheap.
    */
  private val glyphCodes: Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    ('A' to 'Z').foreach(c => b += c.toString -> c.toInt)
    ('a' to 'z').foreach(c => b += c.toString -> c.toInt)
    Seq("zero", "one", "two", "three", "four", "five", "six", "seven",
      "eight", "nine").zipWithIndex.foreach { case (nm, i) => b += nm -> ('0' + i) }
    Seq("space" -> ' ', "exclam" -> '!', "quotedbl" -> '"',
      "numbersign" -> '#', "dollar" -> '$', "percent" -> '%',
      "ampersand" -> '&', "quotesingle" -> '\'', "parenleft" -> '(',
      "parenright" -> ')', "asterisk" -> '*', "plus" -> '+',
      "comma" -> ',', "hyphen" -> '-', "period" -> '.', "slash" -> '/',
      "colon" -> ':', "semicolon" -> ';', "less" -> '<', "equal" -> '=',
      "greater" -> '>', "question" -> '?', "at" -> '@',
      "bracketleft" -> '[', "backslash" -> '\\', "bracketright" -> ']',
      "asciicircum" -> '^', "underscore" -> '_', "grave" -> '`',
      "braceleft" -> '{', "bar" -> '|', "braceright" -> '}',
      "asciitilde" -> '~').foreach { case (nm, c) => b += nm -> c.toInt }
    b.result()
  }

  private def glyphToString(name: String): String =
    if (name.length == 7 && name.startsWith("uni") &&
      name.drop(3).forall(c => Character.digit(c, 16) >= 0))
      Integer.parseInt(name.drop(3), 16).toChar.toString
    else glyphCodes.get(name) match {
      case Some(cp) => cp.toChar.toString
      case None => throw new IllegalArgumentException(
        s"Pdf.parse: glyph name /$name outside the Latin subset")
    }

  /** Apply a ToUnicode CMap (single-byte codespace) onto a 256-entry
    * code→text table. bfchar pairs and bfrange triples (contiguous or
    * array-destination) are honored; a multi-byte codespace or source
    * code rejects by name — that is composite/CID territory this subset
    * scopes out. Unmapped codes keep their encoding-derived entries
    * (the spec's fallback order).
    */
  private def applyToUnicode(data: Array[Byte], map: Array[String]): Unit = {
    val lx = new Lex(data, 0)
    val buf = scala.collection.mutable.ArrayBuffer.empty[PVal]
    var mode = "" // "", codespace, bfchar, bfrange
    def src(v: PVal): Int = v match {
      case PStr(b) =>
        require(b.length == 1, "Pdf.parse: multi-byte ToUnicode code " +
          "(composite/CID font) not supported")
        b(0) & 0xff
      case other => throw new IllegalArgumentException(
        s"Pdf.parse: ToUnicode source code is $other")
    }
    def dst(v: PVal): String = v match {
      case PStr(b) => new String(b, "UTF-16BE")
      case other => throw new IllegalArgumentException(
        s"Pdf.parse: ToUnicode destination is $other")
    }
    def flush(endTok: String): Unit = {
      endTok match {
        case "endcodespacerange" =>
          require(buf.length % 2 == 0, "Pdf.parse: odd codespacerange")
          buf.foreach(src) // 1-byte check is the point
        case "endbfchar" =>
          require(buf.length % 2 == 0, "Pdf.parse: odd bfchar list")
          buf.grouped(2).foreach { g => map(src(g(0))) = dst(g(1)) }
        case "endbfrange" =>
          require(buf.length % 3 == 0, "Pdf.parse: bfrange not in triples")
          buf.grouped(3).foreach { g =>
            val lo = src(g(0)); val hi = src(g(1)); val d = g(2)
            require(lo <= hi, s"Pdf.parse: bfrange $lo > $hi")
            d match {
              case PArr(items) =>
                require(items.length == hi - lo + 1,
                  s"Pdf.parse: bfrange array of ${items.length} for ${hi - lo + 1} codes")
                items.zipWithIndex.foreach { case (it, i) => map(lo + i) = dst(it) }
              case s: PStr =>
                val base = dst(s)
                require(base.nonEmpty, "Pdf.parse: empty bfrange destination")
                (lo to hi).foreach { c =>
                  // increment the LAST UTF-16 unit, the spec's rule
                  map(c) = base.dropRight(1) +
                    (base.last + (c - lo)).toChar
                }
              case other => throw new IllegalArgumentException(
                s"Pdf.parse: bfrange destination is $other")
            }
          }
        case _ => ()
      }
      buf.clear(); mode = ""
    }
    while ({ lx.skipWs(); lx.at < lx.n }) {
      val b = lx.peek
      if (b == '<' && lx.at + 1 < lx.n && (lx.p(lx.at + 1) & 0xff) == '<') {
        val v = value(lx); if (mode.nonEmpty) buf += v
      }
      else if (b == '<') { lx.at += 1; val v = PStr(lx.hexString()); if (mode.nonEmpty) buf += v }
      else if (b == '(') { lx.at += 1; val v = PStr(lx.literalString()); if (mode.nonEmpty) buf += v }
      else if (b == '[') { val v = value(lx); if (mode.nonEmpty) buf += v }
      else if (b == '/') { lx.at += 1; val v = PName(lx.token()); if (mode.nonEmpty) buf += v }
      else {
        val t = lx.token()
        if (t.nonEmpty && (t(0).isDigit || t(0) == '-' || t(0) == '+' || t(0) == '.')) {
          if (mode.nonEmpty) buf += PNum(t.toDouble)
        } else t match {
          case "begincodespacerange" => buf.clear(); mode = "codespace"
          case "beginbfchar" => buf.clear(); mode = "bfchar"
          case "beginbfrange" => buf.clear(); mode = "bfrange"
          case "endcodespacerange" | "endbfchar" | "endbfrange" => flush(t)
          case _ => () // findresource/begin/def/...: CMap plumbing
        }
      }
    }
  }

  /** Identity (Latin-1) code table — the StandardEncoding-compatible
    * default that keeps the pre-r17 byte semantics for unmapped fonts.
    */
  private def identityMap(): Array[String] =
    Array.tabulate(256)(i => i.toChar.toString)

  /** Build each page font's 256-entry code→text table from /Resources:
    * base-encoding names keep identity (their printable-ASCII range is
    * byte-identical), /Differences overlays glyph-name entries, and a
    * /ToUnicode CMap overrides both. Composite (/Type0) fonts reject by
    * name — CID text needs the full CMap stack, and extracting wrong
    * bytes silently is the one failure mode this tier never ships.
    */
  private def fontMaps(doc: Doc, page: PDict): Map[String, Array[String]] = {
    val res = page.m.get("Resources").map(doc.resolve) match {
      case Some(d: PDict) => d
      case Some(other) => throw new IllegalArgumentException(
        s"Pdf.parse: /Resources is $other")
      case None => return Map.empty
    }
    val fonts = res.m.get("Font").map(doc.resolve) match {
      case Some(d: PDict) => d
      case Some(other) => throw new IllegalArgumentException(
        s"Pdf.parse: /Resources /Font is $other")
      case None => return Map.empty
    }
    fonts.m.map { case (fname, fref) =>
      val f = doc.resolve(fref) match {
        case d: PDict => d
        case other => throw new IllegalArgumentException(
          s"Pdf.parse: font /$fname is $other")
      }
      f.m.get("Subtype").map(doc.resolve) match {
        case Some(PName("Type1" | "TrueType" | "Type3" | "MMType1")) => ()
        case Some(PName(st)) => throw new IllegalArgumentException(
          s"Pdf.parse: /$st font not supported (composite/CID text needs " +
            "the full CMap stack; simple fonts only)")
        case _ => ()
      }
      val map = identityMap()
      f.m.get("Encoding").map(doc.resolve) match {
        case Some(PName("WinAnsiEncoding" | "MacRomanEncoding" |
                        "StandardEncoding" | "PDFDocEncoding")) => ()
        case Some(d: PDict) =>
          d.m.get("Differences").map(doc.resolve) match {
            case Some(PArr(items)) =>
              var code = -1
              items.map(doc.resolve).foreach {
                case PNum(v) =>
                  code = v.toInt
                  require(code >= 0 && code <= 255,
                    s"Pdf.parse: /Differences code $code out of byte range")
                case PName(g) =>
                  require(code >= 0 && code <= 255,
                    "Pdf.parse: /Differences glyph before any code")
                  map(code) = glyphToString(g)
                  code += 1
                case other => throw new IllegalArgumentException(
                  s"Pdf.parse: /Differences item is $other")
              }
            case None => ()
            case Some(other) => throw new IllegalArgumentException(
              s"Pdf.parse: /Differences is $other")
          }
        case Some(PName(enc)) => throw new IllegalArgumentException(
          s"Pdf.parse: /Encoding /$enc not supported")
        case Some(other) => throw new IllegalArgumentException(
          s"Pdf.parse: /Encoding is $other")
        case None => ()
      }
      f.m.get("ToUnicode").map(doc.resolve).foreach {
        case s: PStream => applyToUnicode(doc.streamData(s), map)
        case PNull => ()
        case other => throw new IllegalArgumentException(
          s"Pdf.parse: /ToUnicode is $other, not a CMap stream")
      }
      fname -> map
    }
  }

  /** Extract one page's text per the pinned assembly convention. */
  def pageText(doc: Doc, page: PDict): String = {
    val contents = page.m.get("Contents").map(doc.resolve) match {
      case Some(s: PStream) => Seq(s)
      case Some(PArr(items)) => items.map(doc.resolve).map {
        case s: PStream => s
        case other => throw new IllegalArgumentException(
          s"Pdf.parse: /Contents array item is $other, not a stream")
      }
      case Some(other) => throw new IllegalArgumentException(
        s"Pdf.parse: /Contents is $other")
      case None => Seq.empty
    }
    // the spec treats a multi-part /Contents array as ONE stream with the
    // parts whitespace-separated — join with '\n' so a token split across
    // the part boundary can't fuse with the next part's first token
    val content = contents.map(doc.streamData) match {
      case Seq() => Array.empty[Byte]
      case parts => parts.reduce((a, b) => a ++ Array('\n'.toByte) ++ b)
    }
    extractText(content, fontMaps(doc, page))
  }

  /** Text from one decoded content stream: Tj/TJ/'/" inside BT..ET;
    * Td/TD/T* (and the moves implied by ' and ") insert one '\n'
    * between show ops. Operands outside the text ops are consumed and
    * dropped (a graphics-heavy page costs a token scan, nothing more).
    * `fonts` carries each resource font's code→text table; Tf switches
    * the active one, and shown bytes map through it — so /Differences
    * re-encodings and /ToUnicode CMaps (LaTeX Type1 subsets, the
    * dominant real-PDF shape) extract faithfully instead of leaking
    * raw glyph codes as mojibake.
    */
  def extractText(content: Array[Byte],
                  fonts: Map[String, Array[String]] = Map.empty): String = {
    val lx = new Lex(content, 0)
    val sb = new StringBuilder
    val stack = scala.collection.mutable.ArrayBuffer.empty[PVal]
    var pendingBreak = false
    var shownAny = false
    var cur: Array[String] = null // active code table; null = identity
    def break(): Unit = { pendingBreak = true }
    def show(bytes: Array[Byte]): Unit = {
      if (pendingBreak && shownAny) sb.append('\n')
      pendingBreak = false; shownAny = true
      if (cur == null) sb.append(new String(bytes, "ISO-8859-1"))
      else bytes.foreach(b => sb.append(cur(b & 0xff)))
    }
    while ({ lx.skipWs(); lx.at < lx.n }) {
      val b = lx.peek
      if (b == '(' ) { lx.at += 1; stack += PStr(lx.literalString()) }
      else if (b == '<' && lx.at + 1 < lx.n && (lx.p(lx.at + 1) & 0xff) == '<') {
        stack += value(lx) // inline dict (e.g. BDC properties)
      }
      else if (b == '<') { lx.at += 1; stack += PStr(lx.hexString()) }
      else if (b == '[') { stack += value(lx) }
      else if (b == '/') { lx.at += 1; stack += PName(lx.token()) }
      else {
        val t = lx.token()
        if (t.nonEmpty && (t(0).isDigit || t(0) == '-' || t(0) == '+' || t(0) == '.'))
          stack += PNum(t.toDouble)
        else {
          t match {
            case "Tj" =>
              stack.lastOption match {
                case Some(PStr(s)) => show(s)
                case other => throw new IllegalArgumentException(
                  s"Pdf.parse: Tj with $other operand")
              }
            case "TJ" =>
              stack.lastOption match {
                case Some(PArr(items)) =>
                  if (pendingBreak && shownAny) { sb.append('\n'); pendingBreak = false }
                  items.foreach {
                    case PStr(s) => show(s)
                    case PNum(_) => () // kerning adjustments carry no text
                    case other => throw new IllegalArgumentException(
                      s"Pdf.parse: TJ array item $other")
                  }
                case other => throw new IllegalArgumentException(
                  s"Pdf.parse: TJ with $other operand")
              }
            case "'" =>
              break()
              stack.lastOption match {
                case Some(PStr(s)) => show(s)
                case other => throw new IllegalArgumentException(
                  s"Pdf.parse: ' with $other operand")
              }
            case "\"" =>
              break()
              stack.lastOption match {
                case Some(PStr(s)) => show(s)
                case other => throw new IllegalArgumentException(
                  s"Pdf.parse: \" with $other operand")
              }
            case "Td" | "TD" | "T*" => break()
            case "Tf" =>
              // operands: /Name size — the name selects the code table
              stack.dropRight(1).lastOption match {
                case Some(PName(fname)) =>
                  cur = fonts.get(fname) match {
                    case Some(m) => m
                    case None if fonts.isEmpty => null // no resources: identity
                    case None => throw new IllegalArgumentException(
                      s"Pdf.parse: Tf names font /$fname absent from /Resources")
                  }
                case other => throw new IllegalArgumentException(
                  s"Pdf.parse: Tf with $other name operand")
              }
            case _ => () // BT, ET, graphics ops: operands dropped
          }
          stack.clear()
        }
      }
    }
    sb.toString
  }

  // =====================================================================
  // plant + Spark ops
  // =====================================================================

  /** Append an INCREMENTAL UPDATE (the classic save-in-place form real
    * PDF editors produce): a replacement object, a new xref section
    * covering only it, and a trailer whose /Prev points at the previous
    * xref — readers must resolve the object through the NEWEST section.
    * `objNum`'s new body is `objBody` (a dictionary line).
    */
  def appendUpdate(payload: Array[Byte], objNum: Long, objBody: String): Array[Byte] = {
    val prev = {
      val tail = new String(payload, math.max(0, payload.length - 2048),
        math.min(2048, payload.length), "ISO-8859-1")
      val at = tail.lastIndexOf("startxref")
      require(at >= 0, "appendUpdate: no startxref in the base payload")
      tail.substring(at + 9).trim.takeWhile(_.isDigit).toLong
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(payload)
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("\n")
    val objAt = out.size().toLong
    w(s"$objNum 0 obj\n$objBody\nendobj\n")
    val xrefAt = out.size().toLong
    w(s"xref\n0 1\n0000000000 65535 f \n$objNum 1\n")
    w(f"$objAt%010d 00000 n \n")
    // /Size must still cover every object; copy the base trailer's Root
    w(s"trailer\n<< /Size ${objNum + 1} /Root 1 0 R /Info $objNum 0 R " +
      s"/Prev $prev >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** The /Info /Producer string (resolved through the NEWEST xref
    * section, so an incrementally-updated Info must win over the
    * original). Empty when the trailer has no /Info.
    */
  def producerOf(doc: Doc): String =
    doc.trailer.m.get("Info").map(doc.resolve) match {
      case Some(d: PDict) => d.m.get("Producer").map(doc.resolve) match {
        case Some(PStr(b)) => new String(b, "ISO-8859-1")
        case _ => ""
      }
      case _ => ""
    }

  /** Planted document parameters (spec for the fixture replica): the
    * doc's whitespace words page in groups of 12, each page renders as
    * lines of 4 words; wire-form variety by id — the MODERN PDF-1.5
    * skeleton on id%11==3 (cross-reference stream; object streams on
    * even ids, the PNG Up predictor on id%3==0), else the classic form
    * with Flate compression on even ids, indirect /Length on id%7==0,
    * a nested Pages node on id%9==0; octal-escaped first string bytes
    * on id%3==0, whole lines as hex strings on id%5==0; lowercase
    * re-encoded through /Differences on id%17==0 and through a
    * /ToUnicode CMap on id%19==0 (both invert on extraction). The
    * DECODED text is the plain words in
    * every variant, so the replica derives expected text from the words
    * alone: page text = lines of 4 words joined with '\n'. Characters
    * above U+00FF are replaced with '?' BEFORE rendering (classic PDF
    * string bytes are single-byte; representing CJK needs the ToUnicode
    * machinery this subset scopes out) — the replica applies the same
    * replacement. On id%13==0 the file carries a real INCREMENTAL UPDATE
    * replacing the Info object (producer suffixed " r2") behind a /Prev
    * xref chain — the page text is unchanged, but the producer is only
    * reachable through the newest section.
    */
  def plantPdf(id: Long, text: String): Option[Array[Byte]] = {
    val words = Option(text).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
      .map(_.map(c => if (c > 0xFF) '?' else c))
    if (words.isEmpty) return None
    val pages = words.grouped(12).map { pw =>
      pw.grouped(4).map(_.mkString(" ")).toSeq
    }.toSeq
    val base =
      if (id % 11 == 3)
        // the MODERN wire form (PDF 1.5+): cross-reference stream, with
        // object streams on even ids and the PNG Up predictor on id%3==0
        encodeModern(pages, s"graft-pdf $id",
          objStm = id % 2 == 0, predictor = id % 3 == 0,
          escapeFirst = id % 3 == 0, hexLines = id % 5 == 0)
      else encode(pages, s"graft-pdf $id",
        compress = id % 2 == 0, indirectLength = id % 7 == 0,
        nestedKids = id % 9 == 0,
        escapeFirst = id % 3 == 0, hexLines = id % 5 == 0,
        // font re-encodings (decode back to the same text, so the
        // replica is untouched): /Differences on id%17==0, a /ToUnicode
        // CMap on id%19==0
        fontVariant = if (id % 17 == 0) 1 else if (id % 19 == 0) 2 else 0)
    if (id % 13 != 0) Some(base)
    else {
      // the Info object is the last-numbered object of encode()'s layout;
      // recover its number from the base trailer rather than re-deriving
      val infoNum = {
        val t = new String(base, "ISO-8859-1")
        val at = t.lastIndexOf("/Info ")
        t.substring(at + 6).trim.takeWhile(_.isDigit).toLong
      }
      Some(appendUpdate(base, infoNum,
        s"<< /Producer (graft-pdf $id r2) >>"))
    }
  }

  /** Expected producer per the plant — the replica's one-liner. */
  def plantProducer(id: Long): String =
    if (id % 13 == 0) s"graft-pdf $id r2" else s"graft-pdf $id"

  /** A PDF payload row (binary column + id, the crawl shape). */
  case class PdfItem(doc_id: Long, payload: Array[Byte])

  /** The (id, text) scan is small but each row synthesizes a multi-KB
    * payload (Flate compression included) — repartition so the plant and
    * every downstream parse parallelize instead of riding the fixture's
    * single parquet split (see [[Mp4.mp4FromDocuments]]).
    */
  def pdfFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[PdfItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, tx) =>
        plantPdf(id, tx).map(PdfItem(id, _))
      })
  }

  /** One extracted page. */
  case class PdfPage(doc_id: Long, page_idx: Int, text: String, n_words: Int)

  /** Per-page text extraction — one `mapPartitions` pass, payloads never
    * leave executors; cost ∝ content-stream bytes (the text layer), not
    * embedded image bytes, which the walk never inflates.
    */
  def extractPages(spark: SparkSession, pdfs: Dataset[PdfItem]): Dataset[PdfPage] = {
    import spark.implicits._
    pdfs.mapPartitions(_.flatMap { item =>
      val doc = open(item.payload)
      pageObjects(doc).zipWithIndex.map { case (pg, i) =>
        val txt = pageText(doc, pg)
        val nw = { val t = txt.trim; if (t.isEmpty) 0 else t.split("\\s+").length }
        PdfPage(item.doc_id, i, txt, nw)
      }
    })
  }

  /** Per-document metadata (the /Info walk — resolves through the newest
    * xref section, so incrementally-updated files report the update).
    */
  def docMeta(spark: SparkSession, pdfs: Dataset[PdfItem]): DataFrame = {
    import spark.implicits._
    pdfs.mapPartitions(_.map { item =>
      (item.doc_id, producerOf(open(item.payload)))
    }).toDF("doc_id", "producer")
  }

  /** Per-document stats over the extraction — the curation row (page
    * count, words, chars, producer) a text pipeline gates on before
    * keeping a crawl PDF. ONE parse per payload (pages and /Info in the
    * same walk — parsing twice would double the decompression bill at
    * crawl scale) and ONE doc_id-keyed shuffle: the producer rides each
    * page row and folds with max(), which is exact because it is
    * constant per document.
    */
  def docStats(spark: SparkSession, pdfs: Dataset[PdfItem]): DataFrame = {
    import spark.implicits._
    pdfs.mapPartitions(_.flatMap { item =>
      val doc = open(item.payload)
      val producer = producerOf(doc)
      pageObjects(doc).map { pg =>
        val txt = pageText(doc, pg)
        val nw = { val t = txt.trim; if (t.isEmpty) 0 else t.split("\\s+").length }
        (item.doc_id, nw, txt.codePointCount(0, txt.length), producer)
      }
    }).toDF("doc_id", "n_words", "n_chars", "producer")
      .groupBy("doc_id").agg(
        count(lit(1)).cast("long").as("n_pages"),
        sum(col("n_words")).cast("long").as("total_words"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        max(col("n_words")).cast("long").as("max_page_words"),
        max(col("producer")).as("producer"))
  }
}
