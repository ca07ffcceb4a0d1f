package graft

import graft.sources.WebArchive
import org.apache.spark.sql.functions.col

/** WET/WARC ingestion: record framing via the delimiter-split scan, header
  * parsing, Content-Length payload cut, and composition with the curation
  * operators downstream.
  */
class WebArchiveSpec extends SparkSpec {

  private def wetRecord(url: String, text: String, extraLen: Option[Int] = None): String = {
    val body = text
    val len = extraLen.getOrElse(body.getBytes("UTF-8").length)
    s"""WARC/1.0\r
       |WARC-Type: conversion\r
       |WARC-Target-URI: $url\r
       |WARC-Date: 2026-08-13T00:00:00Z\r
       |WARC-Record-ID: <urn:uuid:$url>\r
       |Content-Type: text/plain\r
       |Content-Length: $len\r
       |\r
       |$body\r
       |\r
       |""".stripMargin
  }

  private def writeWet(records: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-wet")
    // two files: splitting/parallel parse must not depend on one stream
    val (a, b) = records.splitAt(math.max(records.length / 2, 1))
    java.nio.file.Files.writeString(dir.resolve("part0.warc"), a.mkString)
    if (b.nonEmpty) java.nio.file.Files.writeString(dir.resolve("part1.warc"), b.mkString)
    dir.toString
  }

  test("WET records parse: framing, headers, Content-Length byte cut") {
    val dir = writeWet(Seq(
      wetRecord("http://a.example/1", "alpha beta gamma"),
      wetRecord("http://a.example/2", "delta epsilon"),
      // multibyte: Content-Length counts BYTES, not chars
      wetRecord("http://a.example/3", "héllo wörld"),
      wetRecord("http://b.example/4", "final record")))
    val docs = WebArchive.wetDocuments(spark, s"$dir/*.warc")
    val byUrl = docs.collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(byUrl.size === 4)
    assert(byUrl("http://a.example/1") === "alpha beta gamma")
    assert(byUrl("http://a.example/3") === "héllo wörld")
    val meta = WebArchive.records(spark, s"$dir/*.warc")
      .filter(col("url") === "http://a.example/2").collect().head
    assert(meta.getString(0) === "conversion")
    assert(meta.getString(2) === "2026-08-13T00:00:00Z")
    assert(meta.getLong(5) === "delta epsilon".getBytes("UTF-8").length.toLong)
  }

  test("non-conversion records and preambles are framed but filterable") {
    val mixed =
      s"""WARC/1.0\r
         |WARC-Type: warcinfo\r
         |Content-Length: 9\r
         |\r
         |info body\r
         |\r
         |""".stripMargin + wetRecord("http://c.example/1", "kept text")
    val dir = java.nio.file.Files.createTempDirectory("graft-wet2")
    java.nio.file.Files.writeString(dir.resolve("f.warc"), mixed)
    val all = WebArchive.records(spark, s"$dir/f.warc")
    assert(all.count() === 2)
    assert(WebArchive.wetDocuments(spark, s"$dir/f.warc").count() === 1)
    val info = all.filter(col("warc_type") === "warcinfo").collect().head
    assert(info.getString(6) === "info body")
  }

  private def gzipMember(record: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record.getBytes("UTF-8"))
    gz.finish()
    bos.toByteArray
  }

  /** One gzip member per record, concatenated — the Common Crawl layout. */
  private def writeWarcGz(dir: java.nio.file.Path, name: String, records: Seq[String]): Unit =
    java.nio.file.Files.write(dir.resolve(name),
      records.map(gzipMember).reduce(_ ++ _))

  test("gzip member framing parses identically to plaintext") {
    val recs = Seq(
      wetRecord("http://gz.example/1", "alpha beta gamma"),
      wetRecord("http://gz.example/2", "héllo wörld multibyte"),
      wetRecord("http://gz.example/3", "the third record body"),
      wetRecord("http://gz.example/4", "and a fourth one"))
    val dir = java.nio.file.Files.createTempDirectory("graft-warcgz")
    java.nio.file.Files.writeString(dir.resolve("plain.warc"), recs.mkString)
    val (a, b) = recs.splitAt(2)
    writeWarcGz(dir, "part0.warc.gz", a)
    writeWarcGz(dir, "part1.warc.gz", b)
    def rows(path: String) =
      WebArchive.records(spark, path).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
                   r.getString(4), r.getLong(5), r.getString(6)))
        .sortBy(_._2)
    val plain = rows(s"$dir/plain.warc")
    val gz = rows(s"$dir/*.warc.gz")
    assert(gz.length === 4)
    assert(gz.toSeq === plain.toSeq)
  }

  test("mixed directories route per matched file: plaintext and gzip forms " +
    "read correctly in one call") {
    val recsA = Seq(
      wetRecord("http://mix.example/p1", "plain one"),
      wetRecord("http://mix.example/p2", "plain two"))
    val recsB = Seq(
      wetRecord("http://mix.example/g1", "gzipped one"),
      wetRecord("http://mix.example/g2", "gzipped twö multibyte"))
    val dir = java.nio.file.Files.createTempDirectory("graft-warcmix")
    java.nio.file.Files.writeString(dir.resolve("plain.warc"), recsA.mkString)
    writeWarcGz(dir, "packed.warc.gz", recsB)
    // one DIRECTORY read covers both forms (the pre-round-11 suffix-of-
    // the-whole-path routing would have mis-framed one kind)
    val both = WebArchive.records(spark, dir.toString).collect()
      .map(r => (r.getString(1), r.getString(6))).sortBy(_._1)
    assert(both.length === 4)
    assert(both.map(_._1).toSeq === Seq("http://mix.example/g1",
      "http://mix.example/g2", "http://mix.example/p1", "http://mix.example/p2"))
    assert(both.collect { case (u, t) if u.endsWith("g2") => t }.head ===
      "gzipped twö multibyte")
    // a glob matching both forms routes identically
    val glob = WebArchive.records(spark, s"$dir/*.warc*").count()
    assert(glob === 4)
    // no matching files fails loudly, not silently-empty
    val e = intercept[java.io.FileNotFoundException] {
      WebArchive.records(spark, s"$dir/nothing-here-*.warc")
    }
    assert(e.getMessage.contains("no input files"))
  }

  test("gzip members decode across forced byte-range splits (sync scan)") {
    val recs = (1 to 30).map(i => wetRecord(s"http://split.example/$i", s"document body number $i lorem ipsum dolor"))
    val dir = java.nio.file.Files.createTempDirectory("graft-warcgz-split")
    writeWarcGz(dir, "many.warc.gz", recs)
    val hconf = spark.sparkContext.hadoopConfiguration
    val prev = hconf.get("mapreduce.input.fileinputformat.split.maxsize")
    hconf.set("mapreduce.input.fileinputformat.split.maxsize", "300")
    try {
      val df = WebArchive.records(spark, s"$dir/many.warc.gz")
      assert(df.rdd.getNumPartitions > 1) // the point: member boundaries are split points
      val urls = df.collect().map(_.getString(1)).sorted
      assert(urls.toSeq === recs.indices.map(i => s"http://split.example/${i + 1}").sorted)
    } finally {
      if (prev == null) hconf.unset("mapreduce.input.fileinputformat.split.maxsize")
      else hconf.set("mapreduce.input.fileinputformat.split.maxsize", prev)
    }
  }

  test("gzip member reader: randomized payloads, arbitrary split points and " +
    "injected garbage still yield every member exactly once") {
    import org.apache.hadoop.fs.Path
    import org.apache.hadoop.mapreduce.lib.input.FileSplit
    import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
    import org.apache.hadoop.mapreduce.TaskAttemptID
    val rnd = new scala.util.Random(0x6Eed)
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val dir = java.nio.file.Files.createTempDirectory("graft-gzprop")
    (1 to 12).foreach { trial =>
      // members with payloads from empty to multi-KB binary-ish text;
      // some trials inject garbage between members (mid-file corruption:
      // robust-lossy resync must skip it without losing real members)
      val n = 1 + rnd.nextInt(6)
      val payloads = (1 to n).map { i =>
        val len = rnd.nextInt(3000)
        val sb = new StringBuilder(s"member-$trial-$i:")
        (0 until len).foreach(_ => sb.append((32 + rnd.nextInt(90)).toChar))
        sb.toString
      }
      val bos = new java.io.ByteArrayOutputStream()
      payloads.foreach { p =>
        if (rnd.nextInt(3) == 0) {
          // garbage that may even contain the gzip magic prefix — the
          // CRC-validated decode must reject it and rescan
          val g = new Array[Byte](1 + rnd.nextInt(40))
          rnd.nextBytes(g)
          if (g.length > 2 && rnd.nextBoolean()) { g(0) = 0x1f; g(1) = 0x8b.toByte; g(2) = 0x08 }
          bos.write(g)
        }
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(p.getBytes("UTF-8")); gz.finish()
      }
      val bytes = bos.toByteArray
      val f = dir.resolve(s"t$trial.gz")
      java.nio.file.Files.write(f, bytes)
      // random 2-3 way split points — ownership rule must hand every
      // member to exactly one range, wherever the cut lands
      val cuts = Seq.fill(1 + rnd.nextInt(2))(rnd.nextInt(bytes.length + 1)).sorted.distinct
      val bounds = (0 +: cuts :+ bytes.length).distinct.sliding(2).toSeq
      val got = bounds.flatMap { case Seq(s, e) =>
        val split = new FileSplit(new Path(f.toUri), s.toLong, (e - s).toLong, Array.empty)
        val ctx = new TaskAttemptContextImpl(conf, new TaskAttemptID())
        val reader = new graft.sources.GzipMemberInputFormat().createRecordReader(split, ctx)
        reader.initialize(split, ctx)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (reader.nextKeyValue()) out += reader.getCurrentValue.toString
        reader.close()
        out
      }
      assert(got.sorted === payloads.sorted,
        s"trial $trial: splits at $cuts of ${bytes.length}B")
    }
  }

  test("WARC/1.1 archives split on the version prefix") {
    val rec11 = wetRecord("http://v11.example/1", "a record in a 1.1 archive")
      .replace("WARC/1.0", "WARC/1.1") +
      wetRecord("http://v11.example/2", "second record").replace("WARC/1.0", "WARC/1.1")
    val dir = java.nio.file.Files.createTempDirectory("graft-warc11")
    java.nio.file.Files.writeString(dir.resolve("v11.warc"), rec11)
    val docs = WebArchive.wetDocuments(spark, s"$dir/v11.warc").collect()
    assert(docs.length === 2)
    assert(docs.map(_.getString(3)).toSet ===
      Set("a record in a 1.1 archive", "second record"))
  }

  test("unsupported WARC major version fails loudly instead of dropping records") {
    val rec2 = wetRecord("http://v2.example/1", "first").replace("WARC/1.0", "WARC/2.0") +
      wetRecord("http://v2.example/2", "second").replace("WARC/1.0", "WARC/2.0")
    val dir = java.nio.file.Files.createTempDirectory("graft-warc2")
    java.nio.file.Files.writeString(dir.resolve("v2.warc"), rec2)
    val e = intercept[org.apache.spark.SparkException] {
      WebArchive.records(spark, s"$dir/v2.warc").collect()
    }
    assert(e.getMessage.contains("WARC framing") ||
      Option(e.getCause).exists(_.getMessage.contains("WARC framing")))
  }

  test("Content-Length cut never lands inside a multibyte sequence") {
    // 'é' is 2 bytes in UTF-8; a Content-Length ending one byte into it
    // must trim the incomplete char, not emit a trailing U+FFFD
    val body = "abcé tail"
    val cutLen = "abc".getBytes("UTF-8").length + 1 // one byte into 'é'
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-cut")
    java.nio.file.Files.writeString(dir.resolve("cut.warc"),
      wetRecord("http://cut.example/1", body, extraLen = Some(cutLen)))
    val doc = WebArchive.records(spark, s"$dir/cut.warc").collect().head
    assert(doc.getString(6) === "abc")
  }

  test("WET ingest composes with the curation tier (dedup + quality)") {
    val dir = writeWet(Seq(
      wetRecord("http://d.example/1", "the quick brown fox jumps over the lazy dog"),
      wetRecord("http://d.example/2", "the quick brown fox jumps over the lazy dog"),
      wetRecord("http://d.example/3", "a completely different document body here")))
    val docs = WebArchive.wetDocuments(spark, s"$dir/*.warc")
      .withColumn("doc_id", org.apache.spark.sql.functions.crc32(col("url")).cast("long"))
    val uniq = graft.operators.Dedup.exact(docs, "doc_id", "text")
    assert(uniq.count() === 2)
    assert(uniq.agg(org.apache.spark.sql.functions.sum(col("cnt"))).head.getLong(0) === 3L)
  }
}
