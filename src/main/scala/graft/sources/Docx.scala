package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** DOCX text extraction — the #3 document source after HTML and PDF
  * (Office documents: reports, theses, government archives). A DOCX is
  * a ZIP (OPC container, ECMA-376) whose body text lives in ONE member,
  * `word/document.xml`: `<w:t>` runs concatenate verbatim inside a
  * `<w:p>` paragraph, and paragraphs separate the text. This tier is a
  * pure COMPOSITION of shipped parts: [[Archives.Zip]] does the
  * container walk (CRC-verified extraction), and the Epub-style
  * anchored-regexp discipline reads the fixed WordprocessingML skeleton
  * every writer emits — NOT a general XML parse.
  *
  * Canonical subset (rejects loudly by name outside it): `<w:t>` run
  * text with the five XML entities; `<w:tab/>` reads as a space and
  * `<w:br/>`/`<w:cr/>` as a newline inside their paragraph. Documents
  * carrying `w:altChunk` (embedded foreign markup) or field codes
  * (`w:fldChar`/`w:instrText` — TOC/page-number machinery whose cached
  * text can silently go stale) REJECT rather than extract wrong text.
  *
  * Reference behavior being matched: the reference stores such payloads
  * as opaque blobs; document extraction is a pipeline extension per the
  * brief. Wire format from the public ECMA-376 / ISO 29500 spec.
  */
object Docx {

  // self-closed empty paragraphs (with or without attributes) match
  // before the open..close form so their '/>' can't swallow siblings;
  // '<w:pPr>' never matches — the char after '<w:p' must be ' ', '>' or '/'
  private val ParaRe = """(?s)<w:p/>|<w:p [^>]*/>|<w:p[ >].*?</w:p>""".r
  // tab/br/cr match attributed self-closed forms too — Word routinely
  // writes `<w:br w:type="page"/>`; dropping those would fuse the words
  // on either side of a page break with no separator
  private val RunRe =
    """(?s)<w:t(?: [^>]*)?>(.*?)</w:t>|<w:tab(?: [^>]*)?/>|<w:br(?: [^>]*)?/>|<w:cr(?: [^>]*)?/>""".r

  private def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&amp;", "&")

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Extract the body text of one DOCX payload: paragraphs in document
    * order, each the verbatim concatenation of its `<w:t>` runs (tabs →
    * space, breaks → newline), entity-decoded; paragraphs join with
    * '\n'. Empty paragraphs are kept (they are vertical structure).
    */
  def extract(payload: Array[Byte]): String = {
    val byName = Archives.Zip.entries(payload).map(e => e._1.name -> e).toMap
    def member(name: String): Array[Byte] = byName.get(name) match {
      case Some((e, off)) => Archives.Zip.extract(payload, e, off)
      case None => throw new IllegalArgumentException(
        s"Docx.parse: no '$name' member (not a DOCX, or a damaged one)")
    }
    require(byName.contains("[Content_Types].xml"),
      "Docx.parse: no [Content_Types].xml member (not an OPC container)")
    val xml = new String(member("word/document.xml"), "UTF-8")
    require(!xml.contains("<w:altChunk"),
      "Docx.parse: w:altChunk (embedded foreign markup) not supported — " +
        "extraction would silently skip embedded content")
    require(!xml.contains("<w:fldChar") && !xml.contains("<w:instrText"),
      "Docx.parse: field codes (w:fldChar/w:instrText) not supported — " +
        "cached field text can be stale and would poison training text")
    ParaRe.findAllIn(xml).map { para =>
      RunRe.findAllMatchIn(para).map { m =>
        val tag = m.matched
        if (tag.startsWith("<w:tab")) " "
        else if (tag.startsWith("<w:br") || tag.startsWith("<w:cr")) "\n"
        else unescape(m.group(1))
      }.mkString
    }.mkString("\n")
  }

  // =====================================================================
  // plant + Spark ops
  // =====================================================================

  /** Planted document (spec for the fixture replica): the doc's
    * whitespace words in paragraphs of 6; word k of a paragraph is its
    * own `<w:r>` run whose `<w:t xml:space="preserve">` carries a
    * LEADING space for k>0 (spaces are literal run text in
    * WordprocessingML — extraction must concatenate runs verbatim, not
    * re-space them); id%4==0 docs render word 1 of each paragraph with
    * a `<w:tab/>` before it instead of the space. XML entities escape
    * on write and decode on read, so `&`, `<`, `>` in corpus words
    * round-trip. The extracted text is EXACTLY the paragraphs of words
    * joined by single spaces, paragraphs joined by '\n'.
    */
  def plantDocx(id: Long, text: String): Option[Array[Byte]] = {
    val words = Option(text).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return None
    val paras = words.grouped(6).map { pw =>
      val runs = pw.zipWithIndex.map { case (w, k) =>
        val esc = escape(w)
        if (k == 0)
          s"""<w:r><w:t xml:space="preserve">$esc</w:t></w:r>"""
        else if (k == 1 && id % 4 == 0)
          s"""<w:r><w:tab/><w:t xml:space="preserve">$esc</w:t></w:r>"""
        else
          s"""<w:r><w:t xml:space="preserve"> $esc</w:t></w:r>"""
      }.mkString
      s"""<w:p w:rsidR="00000000">$runs</w:p>"""
    }.mkString("\n")
    val documentXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
         |<w:body>
         |$paras
         |<w:sectPr/>
         |</w:body>
         |</w:document>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
        |</Types>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
        |</Relationships>""".stripMargin
    Some(Archives.Zip.encode(Seq(
      ("[Content_Types].xml", contentTypes.getBytes("UTF-8"), true),
      ("_rels/.rels", rels.getBytes("UTF-8"), true),
      ("word/document.xml", documentXml.getBytes("UTF-8"), true))))
  }

  case class DocxItem(doc_id: Long, payload: Array[Byte])

  def docxFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[DocxItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, tx) =>
        plantDocx(id, tx).map(DocxItem(id, _))
      })
  }

  /** Body text per document: the zip walk + WordprocessingML read run in
    * `mapPartitions` (payloads stay on executors) — map-only, one row
    * per document, the same plan shape as the PDF tier.
    */
  def extractDocs(spark: SparkSession, docx: Dataset[DocxItem]): DataFrame = {
    import spark.implicits._
    docx.mapPartitions(_.map { d =>
      val text = extract(d.payload)
      val words = { val t = text.trim; if (t.isEmpty) 0 else t.split("\\s+").length }
      (d.doc_id, text, words, text.codePointCount(0, text.length))
    }).toDF("doc_id", "text", "n_words", "n_chars")
  }
}
