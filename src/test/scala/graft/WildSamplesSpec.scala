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
