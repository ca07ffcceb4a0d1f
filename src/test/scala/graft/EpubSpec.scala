package graft

import graft.sources.{Archives, Epub}

/** EPUB composition spec: skeleton walk, spine ORDER (not manifest
  * order), subdirectory href resolution, and loud rejections.
  */
class EpubSpec extends SparkSpec {
  import spark.implicits._

  private def book(spineOrder: Seq[Int]): Array[Byte] = {
    val chapters = Seq("one alpha", "two beta", "three gamma")
    val manifest = chapters.indices.map(k =>
      s"""<item id="c$k" href="text/ch$k.xhtml" media-type="application/xhtml+xml"/>""")
      .mkString("\n")
    val spine = spineOrder.map(k => s"""<itemref idref="c$k"/>""").mkString("\n")
    val opf = s"""<package><manifest>$manifest</manifest><spine>$spine</spine></package>"""
    val container =
      """<container><rootfiles>
        |<rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>
        |</rootfiles></container>""".stripMargin
    Archives.Zip.encode(
      Seq(("mimetype", "application/epub+zip".getBytes("UTF-8"), false),
        ("META-INF/container.xml", container.getBytes("UTF-8"), true),
        ("OEBPS/content.opf", opf.getBytes("UTF-8"), true)) ++
        chapters.zipWithIndex.map { case (c, k) =>
          (s"OEBPS/text/ch$k.xhtml",
            s"<html><body><p>$c</p></body></html>".getBytes("UTF-8"), true)
        })
  }

  test("chapters come back in SPINE order with hrefs resolved relative " +
    "to the OPF directory") {
    val cs = Epub.chapters(book(Seq(2, 0, 1)))
    assert(cs.map(_.href) === Seq("text/ch2.xhtml", "text/ch0.xhtml", "text/ch1.xhtml"))
    assert(cs.map(_.idx) === Seq(0, 1, 2))
    assert(cs.head.xhtml.contains("three gamma"))
  }

  test("malformed books reject by name: wrong mimetype, missing members, " +
    "dangling spine idref") {
    def rej(p: Array[Byte], frag: String): Unit = {
      val m = intercept[IllegalArgumentException](Epub.chapters(p)).getMessage
      assert(m.contains(frag), m)
    }
    rej(Archives.Zip.encode(Seq(("mimetype", "text/plain".getBytes, false))),
      "application/epub+zip")
    rej(Archives.Zip.encode(Seq(
      ("mimetype", "application/epub+zip".getBytes, false))), "container.xml")
    // a dangling spine idref (built properly — editing the OPF in place
    // would break the zip CRC first)
    val opfBad = Archives.Zip.encode(
      Seq(("mimetype", "application/epub+zip".getBytes("UTF-8"), false),
        ("META-INF/container.xml",
          ("""<container><rootfiles><rootfile full-path="c.opf" """ +
            """media-type="x"/></rootfiles></container>""").getBytes("UTF-8"), true),
        ("c.opf", ("""<package><manifest><item id="a" href="x.xhtml" """ +
          """media-type="application/xhtml+xml"/></manifest>""" +
          """<spine><itemref idref="nope"/></spine></package>""").getBytes("UTF-8"), true)))
    rej(opfBad, "not in the manifest")
  }

  test("the Spark op composes zip walk + spine + htmlToText and matches " +
    "the plant on a doc sample") {
    val docs = Tables.documents(spark, sf).limit(20)
    val got = Epub.chapterText(spark, Epub.epubsFromDocuments(spark, docs))
      .orderBy("doc_id", "chapter_idx").collect()
    var checked = 0
    docs.select("doc_id", "text").as[(Long, String)].collect().foreach {
      case (id, text) =>
        val words = Option(text).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
        words.grouped(20).zipWithIndex.foreach { case (cw, k) =>
          val row = got.find(r => r.getLong(0) == id && r.getInt(1) == k).get
          assert(row.getString(3) === s"ch$k Chapter $k & " + cw.mkString(" "),
            s"doc $id ch $k")
          checked += 1
        }
    }
    assert(checked > 20)
  }
}
