package graft

import graft.sources.{Archives, Docx}

/** DOCX tier spec: WordprocessingML extraction semantics (verbatim run
  * concatenation, tabs/breaks, entities, empty paragraphs), loud
  * rejection outside the subset, and the Spark op against the plant.
  */
class DocxSpec extends SparkSpec {
  import spark.implicits._

  private def mini(documentXml: String): Array[Byte] =
    Archives.Zip.encode(Seq(
      ("[Content_Types].xml", "<Types/>".getBytes("UTF-8"), true),
      ("word/document.xml", documentXml.getBytes("UTF-8"), true)))

  test("runs concatenate VERBATIM (no re-spacing), tabs read as spaces, " +
    "breaks as newlines, entities decode, empty paragraphs keep structure") {
    val xml =
      """<w:document><w:body>
        |<w:p><w:r><w:t xml:space="preserve">Hello</w:t></w:r><w:r><w:t xml:space="preserve"> wor</w:t></w:r><w:r><w:t>ld</w:t></w:r></w:p>
        |<w:p/>
        |<w:p w:rsidR="0"><w:r><w:t>a</w:t></w:r><w:r><w:tab/><w:t>b</w:t></w:r><w:r><w:br/><w:t>&amp;c &lt;d&gt;</w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    assert(Docx.extract(mini(xml)) === "Hello world\n\na b\n&c <d>")
  }

  test("attributed self-closed breaks/tabs — Word's page-break form " +
    "<w:br w:type=\"page\"/> — separate text instead of fusing words") {
    val xml =
      """<w:document><w:body>
        |<w:p><w:r><w:t>before</w:t></w:r><w:r><w:br w:type="page"/><w:t>after</w:t></w:r></w:p>
        |<w:p><w:r><w:t>x</w:t></w:r><w:r><w:tab w:val="left"/><w:t>y</w:t></w:r><w:r><w:cr w:x="1"/><w:t>z</w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    assert(Docx.extract(mini(xml)) === "before\nafter\nx y\nz")
  }

  test("outside the subset rejects by name: altChunk, field codes, " +
    "missing members, non-OPC zips") {
    def rej(p: Array[Byte], frag: String): Unit = {
      val m = intercept[IllegalArgumentException](Docx.extract(p)).getMessage
      assert(m.contains(frag), m)
    }
    rej(mini("<w:body><w:altChunk r:id=\"x\"/></w:body>"), "altChunk")
    rej(mini("<w:body><w:p><w:r><w:fldChar w:fldCharType=\"begin\"/></w:r></w:p></w:body>"),
      "field codes")
    rej(mini("<w:body><w:p><w:r><w:instrText>PAGE</w:instrText></w:r></w:p></w:body>"),
      "field codes")
    rej(Archives.Zip.encode(Seq(
      ("[Content_Types].xml", "<Types/>".getBytes("UTF-8"), true))),
      "word/document.xml")
    rej(Archives.Zip.encode(Seq(
      ("word/document.xml", "<w:body/>".getBytes("UTF-8"), true))),
      "[Content_Types].xml")
  }

  test("the Spark op composes zip walk + WordprocessingML read and " +
    "matches the plant on a doc sample") {
    val docs = Tables.documents(spark, sf).limit(30)
    val got = Docx.extractDocs(spark, Docx.docxFromDocuments(spark, docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    var checked = 0
    docs.select("doc_id", "text").as[(Long, String)].collect().foreach {
      case (id, text0) =>
        val words = Option(text0).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
        if (words.nonEmpty) {
          val want = words.grouped(6).map(_.mkString(" ")).mkString("\n")
          val r = got(id)
          assert(r.getString(1) === want, s"doc $id")
          assert(r.getInt(2) === words.length, s"doc $id")
          checked += 1
        }
    }
    assert(checked > 0)
  }
}
