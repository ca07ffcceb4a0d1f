package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** PDF text extraction — after HTML, the largest non-HTML document
  * source an LLM data pipeline ingests. This is the CLASSIC subset
  * (ISO 32000-1, the PDF-1.4-era core that the long tail of real PDFs
  * still uses): the startxref→xref-table→trailer walk (with /Prev
  * chains), indirect objects, dictionaries/arrays/names/strings (literal
  * with escapes + octal, and hex), content streams stored raw or
  * /FlateDecode-compressed (java.util.zip.Inflater — the same inflate
  * discipline the PNG tier ships), /Length as a direct value or an
  * indirect reference (common from real writers), the Catalog→Pages
  * tree walk (nested Pages nodes), and the BT/ET text operators
  * Tj / TJ / ' / " with Td/TD/T* line moves.
  *
  * Out of the canonical subset and rejecting LOUDLY BY NAME: encrypted
  * files (/Encrypt), cross-reference STREAMS (PDF 1.5+ /XRef — a
  * different, compressed xref encoding), object streams (/ObjStm),
  * filters other than FlateDecode, and ToUnicode CMap remapping (string
  * bytes are decoded as Latin-1, which is exact for the
  * StandardEncoding/WinAnsi ASCII range the plant uses).
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

  /** Write one classic PDF. Wire-form variety is the caller's to plant:
    * `compress` Flate-encodes content streams, `indirectLength` stores
    * each stream's /Length as a separate indirect object, `nestedKids`
    * routes all pages through one intermediate Pages node.
    */
  def encode(pages: Seq[Seq[String]], producer: String,
             compress: Boolean, indirectLength: Boolean,
             nestedKids: Boolean,
             escapeFirst: Boolean = false, hexLines: Boolean = false): Array[Byte] = {
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
    obj(font)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"))
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

    val xrefAt = out.size().toLong
    val sorted = offsets.sortBy(_._1)
    w(s"xref\n0 ${sorted.length + 1}\n")
    w("0000000000 65535 f \n")
    sorted.foreach { case (_, off) => w(f"$off%010d 00000 n \n") }
    w(s"trailer\n<< /Size ${sorted.length + 1} /Root 1 0 R /Info $info 0 R >>\n")
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

  /** A parsed document: object fetch-by-ref plus the trailer dict. */
  final class Doc(payload: Array[Byte], xref: Map[Long, Long], val trailer: PDict) {
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
      val off = xref.getOrElse(ref.num,
        throw new IllegalArgumentException(
          s"Pdf.parse: object ${ref.num} not in xref"))
      val lx = new Lex(payload, off.toInt)
      val numTok = lx.token()
      require(numTok.forall(_.isDigit) && numTok.toLong == ref.num,
        s"Pdf.parse: xref offset $off holds object '$numTok', wanted ${ref.num}")
      lx.token() // generation
      lx.expect("obj")
      val v = value(lx)
      lx.skipWs()
      // stream?
      v match {
        case d: PDict if lx.at + 6 <= lx.n &&
            new String(payload, lx.at, 6, "ISO-8859-1") == "stream" =>
          lx.at += 6
          // EOL after 'stream': CRLF or LF (spec)
          if (lx.peek == '\r') lx.at += 1
          if (lx.peek == '\n') lx.at += 1
          val len = resolve(d.m.getOrElse("Length",
            throw new IllegalArgumentException("Pdf.parse: stream without /Length"))) match {
            case PNum(nv) => nv.toLong
            case other => throw new IllegalArgumentException(
              s"Pdf.parse: /Length resolves to $other")
          }
          require(lx.at + len <= lx.n,
            s"Pdf.parse: stream of $len bytes overruns the payload")
          val raw = java.util.Arrays.copyOfRange(payload, lx.at, lx.at + len.toInt)
          PStream(d, raw)
        case other => other
      }
    })
    def resolve(v: PVal): PVal = {
      // ref→ref chains must terminate: a cached object whose VALUE is a
      // reference back into the chain ("5 0 obj 5 0 R endobj") would spin
      // forever without this guard (fetch's inFlight can't see it — the
      // object parses fine; the cycle is in the resolved values)
      @annotation.tailrec
      def go(v: PVal, seen: Set[Long]): PVal = v match {
        case r: PRef =>
          require(!seen(r.num),
            s"Pdf.parse: circular reference chain through object ${r.num}")
          go(fetch(r), seen + r.num)
        case other => other
      }
      go(v, Set.empty)
    }
    /** Decode a stream object's bytes through its /Filter. */
    def streamData(s: PStream): Array[Byte] = {
      s.dict.m.get("Filter").map(resolve) match {
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
    }
  }

  /** Open a document: tail startxref, xref table walk with /Prev chains.
    * Rejects encryption and cross-reference streams by name.
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
    var trailer: Option[PDict] = None
    var nextOff: Option[Long] = Some(firstXref)
    val seen = scala.collection.mutable.Set.empty[Long]
    while (nextOff.isDefined) {
      val off = nextOff.get
      require(seen.add(off), s"Pdf.parse: circular /Prev xref chain at $off")
      require(off >= 0 && off < n, s"Pdf.parse: xref offset $off outside the payload")
      val lx = new Lex(payload, off.toInt)
      val kw = lx.token()
      require(kw == "xref",
        if (kw.forall(_.isDigit))
          "Pdf.parse: cross-reference STREAM at startxref (PDF 1.5+ /XRef) " +
            "not supported (classic xref tables only)"
        else s"Pdf.parse: expected 'xref' at offset $off, found '$kw'")
      var scanning = true
      while (scanning) {
        lx.skipWs()
        val save = lx.at
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
            // earlier (newer) sections win over /Prev chains
            if (kind == 'n' && !xref.contains(start + i)) xref(start + i) = eoff
          }
          val _ = save
        }
      }
      val tdict = value(lx) match {
        case d: PDict => d
        case other => throw new IllegalArgumentException(
          s"Pdf.parse: trailer is $other, not a dictionary")
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
    new Doc(payload, xref.toMap, trailer.get)
  }

  /** Walk the page tree to the leaf /Page objects, in document order. */
  def pageObjects(doc: Doc): Seq[PDict] = {
    val root = doc.resolve(doc.trailer.m("Root")) match {
      case d: PDict => d
      case other => throw new IllegalArgumentException(
        s"Pdf.parse: catalog is $other")
    }
    val pagesRoot = doc.resolve(root.m.getOrElse("Pages",
      throw new IllegalArgumentException("Pdf.parse: catalog has no /Pages")))
    val out = scala.collection.mutable.ArrayBuffer.empty[PDict]
    def walk(node: PVal, depth: Int): Unit = {
      require(depth < 64, "Pdf.parse: page tree deeper than 64 levels")
      doc.resolve(node) match {
        case d: PDict => d.m.get("Type").map(doc.resolve) match {
          case Some(PName("Pages")) =>
            d.m.get("Kids").map(doc.resolve) match {
              case Some(PArr(kids)) => kids.foreach(walk(_, depth + 1))
              case other => throw new IllegalArgumentException(
                s"Pdf.parse: Pages node /Kids is $other")
            }
          case Some(PName("Page")) => out += d
          case other => throw new IllegalArgumentException(
            s"Pdf.parse: page-tree node of type $other")
        }
        case other => throw new IllegalArgumentException(
          s"Pdf.parse: page-tree node is $other")
      }
    }
    walk(pagesRoot, 0)
    require(out.nonEmpty, "Pdf.parse: page tree has no /Page leaves")
    out.toSeq
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
    extractText(content)
  }

  /** Text from one decoded content stream: Tj/TJ/'/" inside BT..ET;
    * Td/TD/T* (and the moves implied by ' and ") insert one '\n'
    * between show ops. Operands outside the text ops are consumed and
    * dropped (a graphics-heavy page costs a token scan, nothing more).
    */
  def extractText(content: Array[Byte]): String = {
    val lx = new Lex(content, 0)
    val sb = new StringBuilder
    val stack = scala.collection.mutable.ArrayBuffer.empty[PVal]
    var pendingBreak = false
    var shownAny = false
    def break(): Unit = { pendingBreak = true }
    def show(bytes: Array[Byte]): Unit = {
      if (pendingBreak && shownAny) sb.append('\n')
      pendingBreak = false; shownAny = true
      sb.append(new String(bytes, "ISO-8859-1"))
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
            case _ => () // Tf, BT, ET, graphics ops: operands dropped
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
    * lines of 4 words; wire-form variety by id — Flate compression on
    * even ids, indirect /Length on id%7==0, a nested Pages node on
    * id%9==0, octal-escaped first string bytes on id%3==0, whole lines
    * as hex strings on id%5==0. The DECODED text is the plain words in
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
    val base = encode(pages, s"graft-pdf $id",
      compress = id % 2 == 0, indirectLength = id % 7 == 0,
      nestedKids = id % 9 == 0,
      escapeFirst = id % 3 == 0, hexLines = id % 5 == 0)
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
