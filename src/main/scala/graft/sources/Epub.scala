package graft.sources

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** EPUB ingestion — the ebook corpus format (Project Gutenberg,
  * library dumps): an EPUB is a ZIP with a fixed skeleton (the
  * `mimetype` member STORED first, `META-INF/container.xml` pointing at
  * the OPF package, the OPF's manifest + spine giving reading order)
  * whose content documents are XHTML. This tier COMPOSES the repo's
  * existing discipline end-to-end: [[Archives.Zip]] does the container
  * walk (CRC-verified extraction), the spine fixes chapter order, and
  * [[TextAnalysis.htmlToText]]'s codegen regexp chain extracts the
  * training text — the XHTML payloads flow through the SAME column
  * operator the crawl HTML path uses, so one extraction spec covers
  * both sources.
  *
  * Canonical subset (publisher-tool EPUBs; rejects loudly by name
  * outside it): exactly one rootfile in container.xml; OPF manifest
  * items with double-quoted id/href attributes; spine itemrefs by
  * idref; hrefs resolve relative to the OPF's directory. The
  * container/OPF XML is matched with anchored regular expressions over
  * those quoted attributes — the fixed skeleton every packaging tool
  * emits — NOT a general XML parse; entity-encoded or single-quoted
  * attribute forms reject rather than mis-resolve.
  */
object Epub {

  private val RootfileRe =
    """<rootfile[^>]*full-path="([^"]+)"[^>]*>""".r
  private val ItemRe =
    """<item\s[^>]*>""".r
  private val AttrId = """\bid="([^"]+)"""".r.unanchored
  private val AttrHref = """\bhref="([^"]+)"""".r.unanchored
  private val ItemrefRe =
    """<itemref\s[^>]*idref="([^"]+)"[^>]*/?>""".r

  /** One chapter in spine order, with its raw XHTML. */
  case class Chapter(idx: Int, href: String, xhtml: String)

  /** Walk one EPUB payload to its spine-ordered chapters. */
  def chapters(payload: Array[Byte]): Seq[Chapter] = {
    // index members by name once — chapter resolution does one lookup per
    // spine item, and a book has hundreds of members
    val byName = Archives.Zip.entries(payload).map(e => e._1.name -> e).toMap
    def member(name: String): Array[Byte] =
      byName.get(name) match {
        case Some((e, off)) => Archives.Zip.extract(payload, e, off)
        case None => throw new IllegalArgumentException(
          s"Epub.parse: no '$name' member (not an EPUB, or a damaged one)")
      }
    val mime = new String(member("mimetype"), "UTF-8").trim
    require(mime == "application/epub+zip",
      s"Epub.parse: mimetype member declares '$mime', not application/epub+zip")
    val container = new String(member("META-INF/container.xml"), "UTF-8")
    val roots = RootfileRe.findAllMatchIn(container).map(_.group(1)).toSeq
    require(roots.length == 1,
      s"Epub.parse: ${roots.length} rootfiles in container.xml (exactly one supported)")
    val opfPath = roots.head
    val opfDir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i => opfPath.substring(0, i + 1)
    }
    val opf = new String(member(opfPath), "UTF-8")
    val hrefById = ItemRe.findAllIn(opf).map { tag =>
      (AttrId.findFirstMatchIn(tag), AttrHref.findFirstMatchIn(tag)) match {
        case (Some(i), Some(h)) => i.group(1) -> h.group(1)
        case _ => throw new IllegalArgumentException(
          s"Epub.parse: manifest item without double-quoted id/href: $tag")
      }
    }.toMap
    val spine = ItemrefRe.findAllMatchIn(opf).map(_.group(1)).toSeq
    require(spine.nonEmpty, "Epub.parse: empty spine (no reading order)")
    spine.zipWithIndex.map { case (idref, i) =>
      val href = hrefById.getOrElse(idref,
        throw new IllegalArgumentException(
          s"Epub.parse: spine idref '$idref' not in the manifest"))
      Chapter(i, href, new String(member(opfDir + href), "UTF-8"))
    }
  }

  // =====================================================================
  // plant + Spark ops
  // =====================================================================

  /** Planted book (spec for the fixture replica): the doc's words in
    * chapters of 20, each chapter XHTML with a <h2> title line
    * ("Chapter k"), paragraphs of 8 words, an inline <em> on word 3 of
    * each paragraph, and an &amp; entity in the title — so the
    * extraction path through htmlToText is exercised, while the
    * EXTRACTED text per chapter is exactly "Chapter k & <words>"
    * whitespace-collapsed. The skeleton: stored mimetype first,
    * container.xml, OEBPS/content.opf with the spine in order.
    */
  def plantEpub(id: Long, text: String): Option[Array[Byte]] = {
    val words = Option(text).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return None
    val chapterWords = words.grouped(20).toSeq
    val chapters = chapterWords.zipWithIndex.map { case (cw, k) =>
      val paras = cw.grouped(8).map { pw =>
        val decorated = pw.zipWithIndex.map { case (w, j) =>
          if (j == 3) s"<em>$w</em>" else w
        }
        s"<p>${decorated.mkString(" ")}</p>"
      }.mkString("\n")
      val xhtml =
        s"""<?xml version="1.0" encoding="utf-8"?>
           |<html xmlns="http://www.w3.org/1999/xhtml">
           |<head><title>ch$k</title></head>
           |<body>
           |<h2>Chapter $k &amp;</h2>
           |$paras
           |</body></html>""".stripMargin
      (s"ch$k.xhtml", xhtml)
    }
    val manifest = chapters.zipWithIndex.map { case ((href, _), k) =>
      s"""<item id="c$k" href="$href" media-type="application/xhtml+xml"/>"""
    }.mkString("\n")
    val spine = chapters.indices.map(k => s"""<itemref idref="c$k"/>""").mkString("\n")
    val opf =
      s"""<?xml version="1.0"?>
         |<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
         |<metadata><dc:title xmlns:dc="http://purl.org/dc/elements/1.1/">doc$id</dc:title></metadata>
         |<manifest>
         |$manifest
         |</manifest>
         |<spine>
         |$spine
         |</spine>
         |</package>""".stripMargin
    val container =
      """<?xml version="1.0"?>
        |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
        |<rootfiles>
        |<rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>
        |</rootfiles>
        |</container>""".stripMargin
    val zipMembers =
      Seq(("mimetype", "application/epub+zip".getBytes("UTF-8"), false),
        ("META-INF/container.xml", container.getBytes("UTF-8"), true),
        ("OEBPS/content.opf", opf.getBytes("UTF-8"), true)) ++
        chapters.map { case (href, xhtml) =>
          (s"OEBPS/$href", xhtml.getBytes("UTF-8"), true)
        }
    Some(Archives.Zip.encode(zipMembers))
  }

  case class EpubItem(doc_id: Long, payload: Array[Byte])

  def epubsFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[EpubItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, tx) =>
        plantEpub(id, tx).map(EpubItem(id, _))
      })
  }

  /** Spine-ordered chapter text: the zip walk + spine resolution run in
    * `mapPartitions` (payloads stay on executors), then the SAME
    * codegen'd [[TextAnalysis.htmlToText]] column the crawl HTML path
    * uses extracts the training text — one extraction spec for both
    * sources.
    */
  def chapterText(spark: SparkSession, epubs: Dataset[EpubItem]): DataFrame = {
    import spark.implicits._
    epubs.mapPartitions(_.flatMap { e =>
      chapters(e.payload).map(c => (e.doc_id, c.idx, c.href, c.xhtml))
    }).toDF("doc_id", "chapter_idx", "href", "xhtml")
      .withColumn("text", TextAnalysis.htmlToText(col("xhtml")))
      .withColumn("n_words", size(split(col("text"), " ")))
      .drop("xhtml")
  }
}
