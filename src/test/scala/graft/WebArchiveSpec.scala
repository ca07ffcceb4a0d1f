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
